"""GenomicRanges — a thin wrapper giving a Spark DataFrame the reference's operator surface.

The reference's ``PyRanges`` is a pandas-DataFrame *subclass*
(``/root/reference/pyranges1/core/pyranges_main.py:78-87``); here we use
composition: ``GenomicRanges(df)`` validates the schema contract
(Chromosome/Start/End [, Strand]) and exposes the interval-algebra methods; the
underlying Spark DataFrame is always available as ``.df`` and every inherited
relational operation (filter/select/groupBy/...) is reached through it.

Like the reference, constructing with missing required columns degrades to the
plain DataFrame semantics (``pyranges_main.py:167-185``): ``wrap`` returns the
raw DataFrame when the contract does not hold.

All operator methods are lazy — they build a Catalyst plan; nothing executes
until an action. A chain of N calls therefore fuses into one optimized plan
(unlike the reference, which materializes every intermediate frame).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm


def _resolve_strand_behavior(self_has: bool, other_has: bool, strand_behavior: str) -> str:
    """Resolve 'auto' like the reference (core/pyranges_helpers.py:289-311).

    Divergence (documented): the reference checks *values* are all in {+,-}
    (an eager scan); we resolve on schema presence only, because a lazy engine
    cannot afford a validation action per operator. Callers needing the strict
    check can run ``validate_strands()`` explicitly.
    """
    if strand_behavior not in nm.VALID_STRAND_BEHAVIOR:
        raise ValueError(f"strand_behavior must be one of {nm.VALID_STRAND_BEHAVIOR}")
    if strand_behavior == nm.STRAND_BEHAVIOR_AUTO:
        return nm.STRAND_BEHAVIOR_SAME if (self_has and other_has) else nm.STRAND_BEHAVIOR_IGNORE
    return strand_behavior


def _resolve_use_strand(has_strand: bool, use_strand: Union[bool, str]) -> bool:
    if use_strand == "auto":
        return has_strand
    return bool(use_strand)


def _natkey_py(name) -> tuple:
    """Driver-side natural-sort key (chr2 < chr11): digit runs compare
    numerically — the Python twin of operators/sort.natkey."""
    import re

    s = str(name)
    s = s[3:] if s.startswith("chr") else s
    # type-tagged parts: numeric runs sort numerically and before letter runs
    # (chr1..chr22 < chrM/X/Y), never raising int-vs-str comparisons
    return tuple(
        (0, int(part), "") if part.isdigit() else (1, 0, part)
        for part in re.split(r"(\d+)", s)
        if part
    )


class GenomicRanges:
    """Interval-frame façade over a Spark DataFrame (see module docstring)."""

    def __init__(self, df: DataFrame, bin_size: int | None = None):
        missing = [c for c in nm.GENOME_LOC_COLS if c not in df.columns]
        if missing:
            raise ValueError(f"GenomicRanges requires columns {nm.GENOME_LOC_COLS}; missing {missing}")
        self._df = df.withColumn(nm.START_COL, F.col(nm.START_COL).cast("long")).withColumn(
            nm.END_COL, F.col(nm.END_COL).cast("long")
        )
        #: Bin width for the binned interval join. THE scale knob: pick
        #: ~max(typical interval length, coordinate_span / desired_parallelism).
        #: Too coarse => few (key,bin) buckets => quadratic in-bucket pairing;
        #: too fine => explode factor from intervals spanning many bins.
        self._bin_size = bin_size

    def resolve_bin(self, bin_size: int | None) -> int:
        return bin_size or self._bin_size or nm.DEFAULT_BIN_SIZE

    # -- plumbing ---------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def __repr__(self) -> str:
        """Schema-only summary — deliberately runs NO Spark job (the
        reference's tostring renders rows eagerly, core/tostring.py; a lazy
        engine must not trigger a distributed scan from a REPL echo). Use
        ``show()``/``head()`` to look at data."""
        cols = ", ".join(f"{c}:{t}" for c, t in self._df.dtypes)
        return f"GenomicRanges[{cols}] (lazy; use .show()/.head() to materialize)"

    def show(self, n: int = 8, truncate: bool = True) -> None:
        """Print the first ``n`` rows (the reference's print surface,
        core/tostring.py — here a direct ``df.show`` delegate)."""
        self._df.show(n, truncate=truncate)

    def tostring(
        self,
        max_col_width: int | None = None,
        max_total_width: int | None = None,
        count_rows: bool = False,
        tail: bool = False,
    ) -> str:
        """Reference-style bounded table repr (core/tostring.py:57), driven
        by ``pr.options`` — the explicit opt-in that runs a ``take(n+1)``
        job; ``__repr__`` stays job-free (see tostring.py module docstring
        for the lazy-engine deviations). ``tail=True`` buys the reference's
        exact head+tail split for two extra jobs."""
        from pyranges_1_x_spark.tostring import tostring as _ts

        return _ts(
            self._df,
            class_name=type(self).__name__,
            max_col_width=max_col_width,
            max_total_width=max_total_width,
            count_rows=count_rows,
            tail=tail,
        )

    def to_html(self) -> str:
        """HTML table repr honoring ``pr.options``' html_max_rows/
        html_max_cols (reference tostring HTML path); same lazy
        ``take(n+1)`` bound as ``tostring``. Also wired as
        ``_repr_html_`` is deliberately NOT done — a notebook auto-repr
        that submits Spark jobs is the same hazard as a job-running
        ``__repr__``; call this explicitly."""
        from pyranges_1_x_spark.tostring import to_html as _th

        return _th(self._df, class_name=type(self).__name__)

    def head(self, n: int = 8):
        """First ``n`` rows as pandas (reference inherits pandas ``head``)."""
        return self._df.limit(n).toPandas()

    @property
    def has_strand(self) -> bool:
        return nm.STRAND_COL in self._df.columns

    @classmethod
    def wrap(cls, df: DataFrame):
        """Wrap if the location contract holds, else return the raw DataFrame
        (the reference's degradation rule, pyranges_main.py:167-185)."""
        if all(c in df.columns for c in nm.GENOME_LOC_COLS):
            return cls(df)
        return df

    def with_row_id(self, col: str = nm.ROW_ID_COL) -> "GenomicRanges":
        """Attach a row-identity column (the Spark stand-in for the reference's
        load-bearing pandas index, SURVEY.md §1.2)."""
        if col in self._df.columns:
            return self
        return GenomicRanges(self._df.withColumn(col, F.monotonically_increasing_id()))

    def group_keys(self, use_strand: Union[bool, str] = "auto", match_by=None) -> list[str]:
        """Implicit grouping keys of unary ops (reference prepare_by_single,
        core/pyranges_helpers.py:157-185)."""
        keys = [nm.CHROM_COL]
        if _resolve_use_strand(self.has_strand, use_strand):
            keys.append(nm.STRAND_COL)
        if match_by:
            keys += [match_by] if isinstance(match_by, str) else list(match_by)
        return keys

    def _binary_prepared(self, other: "GenomicRanges", strand_behavior: str, match_by=None):
        """Resolve strand behavior & grouping keys for binary ops; flip the other
        frame's strand for 'opposite' (reference pyranges_helpers.py:188-227)."""
        sb = _resolve_strand_behavior(self.has_strand, other.has_strand, strand_behavior)
        keys = [nm.CHROM_COL]
        odf = other._df
        if sb == nm.STRAND_BEHAVIOR_SAME:
            keys.append(nm.STRAND_COL)
        elif sb == nm.STRAND_BEHAVIOR_OPPOSITE:
            keys.append(nm.STRAND_COL)
            odf = odf.withColumn(
                nm.STRAND_COL,
                F.when(F.col(nm.STRAND_COL) == "+", F.lit("-"))
                .when(F.col(nm.STRAND_COL) == "-", F.lit("+"))
                .otherwise(F.col(nm.STRAND_COL)),
            )
        if match_by:
            keys += [match_by] if isinstance(match_by, str) else list(match_by)
        return odf, keys

    # -- validation (reference range_frame_validator.py:99-133) -----------
    def invalid_ranges(self) -> DataFrame:
        """Rows violating the advisory contract, tagged with the reason class:
        'nan_start_end' | 'empty_or_negative' | 'negative_coordinates'."""
        d = self._df
        reason = (
            F.when(F.col(nm.START_COL).isNull() | F.col(nm.END_COL).isNull(), "nan_start_end")
            .when(F.col(nm.END_COL) <= F.col(nm.START_COL), "empty_or_negative")
            .when(F.col(nm.START_COL) < 0, "negative_coordinates")
        )
        return d.withColumn("invalid_reason", reason).filter(F.col("invalid_reason").isNotNull())

    # -- simple projections (reference pyranges_main.py:5098-5207,4747,4784)
    def remove_nonloc_columns(self) -> "GenomicRanges":
        cols = [c for c in nm.GENOME_LOC_COLS_WITH_STRAND if c in self._df.columns]
        return GenomicRanges(self._df.select(*cols))

    def get_with_loc_columns(self, keys) -> "GenomicRanges":
        keys = [keys] if isinstance(keys, str) else list(keys)
        loc = [c for c in nm.GENOME_LOC_COLS_WITH_STRAND if c in self._df.columns]
        return GenomicRanges(self._df.select(*loc, *keys))

    def remove_strand(self):
        return GenomicRanges.wrap(self._df.drop(nm.STRAND_COL))

    def flip_strand(self) -> "GenomicRanges":
        return GenomicRanges(
            self._df.withColumn(
                nm.STRAND_COL,
                F.when(F.col(nm.STRAND_COL) == "+", F.lit("-"))
                .when(F.col(nm.STRAND_COL) == "-", F.lit("+"))
                .otherwise(F.col(nm.STRAND_COL)),
            )
        )

    # -- strand validity (reference pyranges_main.py:3418-3452+) -----------
    @property
    def strand_valid(self) -> bool:
        """Whether strand info is valid: a Strand column exists AND every
        value is '+' or '-' (reference strand_valid, pyranges_main.py:3418-3450).
        NB: an eager action (scans until the first invalid value)."""
        if not self.has_strand:
            return False
        return self._df.filter(~F.col(nm.STRAND_COL).isin("+", "-")).isEmpty()

    def make_strand_valid(self) -> "GenomicRanges":
        """Coerce invalid Strand values to '+'; add an all-'+' Strand column if
        absent (reference make_strand_valid, pyranges_main.py:3452+)."""
        if not self.has_strand:
            return GenomicRanges(self._df.withColumn(nm.STRAND_COL, F.lit("+")))
        return GenomicRanges(
            self._df.withColumn(
                nm.STRAND_COL,
                F.when(F.col(nm.STRAND_COL).isin("+", "-"), F.col(nm.STRAND_COL)).otherwise(
                    F.lit("+")
                ),
            )
        )

    # -- natsorted distinct helpers (reference pyranges_main.py:611-632) ---
    @property
    def chromosomes(self) -> list:
        """Distinct chromosomes, natsorted (chr2 < chr11). Driver-side list by
        contract (the reference returns a Python list); the distinct is a
        map-side-combinable hash agg over one column."""
        rows = self._df.select(nm.CHROM_COL).distinct().collect()
        return sorted((r[0] for r in rows), key=_natkey_py)

    @property
    def chromosomes_and_strands(self) -> list:
        """Distinct (chromosome, strand) pairs, natsorted; raises without a
        Strand column (reference pyranges_main.py:617-632)."""
        if not self.has_strand:
            raise ValueError("PyRanges has no strand column.")
        rows = self._df.select(nm.CHROM_COL, nm.STRAND_COL).distinct().collect()
        return sorted(
            ((r[0], r[1]) for r in rows), key=lambda t: (_natkey_py(t[0]), t[1])
        )

    def sort_by_position(self) -> "GenomicRanges":
        """Plain (Start, End) sort (reference range_frame.py:713-715)."""
        return GenomicRanges(self._df.orderBy(nm.START_COL, nm.END_COL))

    @property
    def loci(self) -> "_LociAccessor":
        """Genomic-location accessor (reference core/loci_getter.py).

        Getter forms (overlap semantics for ranges):
        ``gr.loci["chr1"]``, ``gr.loci["+"]``, ``gr.loci[5:10]``,
        ``gr.loci["chr1", "+"]``, ``gr.loci["chr1", 5:10]``,
        ``gr.loci["chr1", "+", 5:10]`` — or call it like the old method:
        ``gr.loci("chr1", start=5, end=10, strand="+")``.

        Setter: Spark plans are immutable, so the reference's in-place
        ``gr.loci[key] = value`` (loci_getter.py:56-58) becomes the
        functional ``gr.loci.assign(key, Column=value, ...)`` — matching
        rows get the assignments, all other rows pass through unchanged.
        """
        return _LociAccessor(self)

    def length_sum(self):
        """Total interval length as a one-row DataFrame — the lazy form of
        the reference's ``.length`` (pyranges_main.py:1404)."""
        return self._df.select(
            F.coalesce(F.sum(F.col(nm.END_COL) - F.col(nm.START_COL)), F.lit(0)).alias("length")
        )

    @property
    def length(self) -> int:
        """Total interval length (reference ``.length`` property,
        pyranges_main.py:1404-1431). Runs one scalar aggregate job; use
        ``length_sum()`` for the lazy DataFrame form."""
        return int(self.length_sum().collect()[0][0])

    def lengths(self) -> "GenomicRanges":
        return GenomicRanges(
            self._df.withColumn("Length", F.col(nm.END_COL) - F.col(nm.START_COL))
        )

    @property
    def loc_columns(self) -> list:
        """Genomic location column names — [Chromosome, Strand] when stranded
        else [Chromosome] (reference ``loc_columns``, pyranges_main.py:1135)."""
        return [nm.CHROM_COL, nm.STRAND_COL] if self.has_strand else [nm.CHROM_COL]

    def copy(self) -> "GenomicRanges":
        """Reference ``.copy()`` (pyranges_main.py:753). Spark plans are
        immutable, so this is a new wrapper over the same logical plan — the
        reference needs a deep copy because pandas mutates in place; here
        every operator already returns a fresh plan. Preserves the
        instance's bin_size so binned-join plan shapes survive the copy."""
        return GenomicRanges(self._df, bin_size=self._bin_size)

    def group_by(self, *cols) -> "GenomicRangesGroupBy":
        """``df.groupBy`` that re-wraps results keeping the location contract
        (reference core/pyranges_groupby.py:13-62 auto-rewraps aggregates that
        retain loc columns; otherwise you get the plain DataFrame back)."""
        return GenomicRangesGroupBy(self._df.groupBy(*cols))

    def groupby(self, *cols) -> "GenomicRangesGroupBy":
        """Reference spelling (pyranges_main.py:204) for ``group_by``."""
        return self.group_by(*cols)

    # -- operator delegation (implementations live in operators/) ---------
    def overlap(self, other, **kw):
        from pyranges_1_x_spark.operators import overlap as _ov

        return _ov.overlap(self, other, **kw)

    def join_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import overlap as _ov

        return _ov.join_overlaps(self, other, **kw)

    def intersect_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import overlap as _ov

        return _ov.intersect_overlaps(self, other, **kw)

    def count_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import overlap as _ov

        return _ov.count_overlaps(self, other, **kw)

    def complement_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import overlap as _ov

        return _ov.complement_overlaps(self, other, **kw)

    def merge_overlaps(self, **kw):
        from pyranges_1_x_spark.operators import merge as _m

        return _m.merge_overlaps(self, **kw)

    def cluster_overlaps(self, **kw):
        from pyranges_1_x_spark.operators import merge as _m

        return _m.cluster_overlaps(self, **kw)

    def outer_ranges(self, group_by=None, **kw):
        from pyranges_1_x_spark.operators import merge as _m

        return _m.outer_ranges(self, group_by, **kw)

    def subtract_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import setops as _s

        return _s.subtract_overlaps(self, other, **kw)

    def complement_ranges(self, group_by=None, **kw):
        from pyranges_1_x_spark.operators import setops as _s

        return _s.complement_ranges(self, group_by, **kw)

    def set_union_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import setops as _s

        return _s.set_union_overlaps(self, other, **kw)

    def set_intersect_overlaps(self, other, **kw):
        from pyranges_1_x_spark.operators import setops as _s

        return _s.set_intersect_overlaps(self, other, **kw)

    def split_overlaps(self, **kw):
        from pyranges_1_x_spark.operators import setops as _s

        return _s.split_overlaps(self, **kw)

    def nearest_ranges(self, other, **kw):
        from pyranges_1_x_spark.operators import nearest as _n

        return _n.nearest_ranges(self, other, **kw)

    def to_coverage(self, **kw):
        from pyranges_1_x_spark.operators import coverage as _c

        return _c.to_coverage(self, **kw)

    def coverage_ratio(self, **kw):
        from pyranges_1_x_spark.operators import coverage as _c

        return _c.coverage_ratio(self, **kw)

    def sort_ranges(self, by=None, **kw):
        from pyranges_1_x_spark.operators import sort as _srt

        return _srt.sort_ranges(self, by, **kw)

    def extend_ranges(self, **kw):
        from pyranges_1_x_spark.operators import geometry as _g

        return _g.extend_ranges(self, **kw)

    def tile_ranges(self, tile_size, **kw):
        from pyranges_1_x_spark.operators import geometry as _g

        return _g.tile_ranges(self, tile_size, **kw)

    def window_ranges(self, window_size, **kw):
        from pyranges_1_x_spark.operators import geometry as _g

        return _g.window_ranges(self, window_size, **kw)

    def clip_ranges(self, chromsizes=None, **kw):
        from pyranges_1_x_spark.operators import geometry as _g

        return _g.clip_ranges(self, chromsizes, **kw)

    def max_disjoint_overlaps(self, **kw):
        from pyranges_1_x_spark.operators import disjoint as _d

        return _d.max_disjoint_overlaps(self, **kw)

    def group_cumsum(self, group_by=None, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.group_cumsum(self, group_by, **kw)

    def slice_ranges(self, start=0, end=None, group_by=None, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.slice_ranges(self, start, end, group_by, **kw)

    def five_end(self, group_by=None, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.five_end(self, group_by, **kw)

    def three_end(self, group_by=None, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.three_end(self, group_by, **kw)

    def upstream(self, length, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.upstream(self, length, **kw)

    def downstream(self, length, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.downstream(self, length, **kw)

    def calculate_frame(self, group_by, **kw):
        from pyranges_1_x_spark.operators import local_coords as _lc

        return _lc.calculate_frame(self, group_by, **kw)

    def map_to_global(self, gr_global, global_on, **kw):
        from pyranges_1_x_spark.operators import mapping as _mp

        return _mp.map_to_global(self, gr_global, global_on, **kw)

    def map_to_local(self, ref, ref_on, **kw):
        from pyranges_1_x_spark.operators import mapping as _mp

        return _mp.map_to_local(self, ref, ref_on, **kw)

    def summary(self, **kw):
        from pyranges_1_x_spark.operators import multi as _mu

        return _mu.summary(self, **kw)

    def count_overlaps_matrix(self, others: dict, **kw):
        """N-ary count matrix with self as the features frame
        (reference pr.count_overlaps with features=self)."""
        from pyranges_1_x_spark.operators import multi as _mu

        return _mu.count_overlaps_matrix(others, features=self, **kw)

    def nearest_distance(self, other, **kw):
        from pyranges_1_x_spark.operators import nearest as _n

        return _n.nearest_distance(self, other, **kw)

    def compute_interval_metrics(self, metrics, **kw):
        from pyranges_1_x_spark.functions import metrics as _mx

        return GenomicRanges.wrap(_mx.compute_interval_metrics(self._df, metrics, **kw))

    def combine_interval_columns(self, function="intersect", **kw):
        from pyranges_1_x_spark.functions import metrics as _mx

        return GenomicRanges.wrap(
            _mx.combine_interval_columns(self._df, function, **kw)
        )

    def extend_orfs(self, sequences, group_by=None, **kw):
        from pyranges_1_x_spark.operators import orfs as _orf

        return _orf.extend_orfs(self, sequences, group_by, **kw)

    def get_sequence(self, sequences=None, **kw):
        from pyranges_1_x_spark.functions import seqs as _sq

        return _sq.get_sequence(self, sequences, **kw)

    def to_rle(self, value_col=None, strand="auto", *, rpm: bool = False):
        """Reference ``to_rle`` (pyranges_main.py:4344): run-length coverage.

        The reference returns a ``pyrle.Rledict`` (per-chromosome run/value
        arrays on one machine); the distributed equivalent is the value-run
        interval relation itself — (Chromosome[,Strand], Start, End, Value)
        rows partitioning the covered axis, which is what ``Rledict.to_ranges``
        would give back and what every downstream reference use (to_bigwig,
        ratio tracks) immediately converts to anyway."""
        return self.to_coverage(use_strand=strand, value_col=value_col, rpm=rpm)

    # -- writers (reference core/out.py; methods on PyRanges) ---------------

    def to_bigwig(
        self,
        path=None,
        chromosome_sizes=None,
        value_col=None,
        *,
        divide: bool = False,
        rpm: bool = True,
        return_data: bool = False,
    ):
        """Reference ``to_bigwig`` method (core/out.py:164-224,
        pyranges_main.py:3994): coverage (value-weighted if ``value_col``,
        RPM-normalized by default) reduced to constant-value runs, written as
        binary bigwig via the native writer (sources/bigwig_native.py).
        ``divide=True`` writes the log2(value coverage / raw depth) track.
        ``return_data=True`` returns the run relation (Score column) instead
        of writing. ``chromosome_sizes`` may be a dict or a frame with
        (Chromosome, End); when None, per-chromosome max End is used."""
        if divide:
            if value_col is None:
                raise ValueError("divide=True requires value_col")
            runs = self.coverage_ratio(
                value_col=value_col, use_strand=False, log2=True, ratio_out="Score"
            ).df.select(nm.CHROM_COL, nm.START_COL, nm.END_COL, "Score")
            runs = runs.filter(F.col("Score").isNotNull())
        else:
            runs = self.to_coverage(
                use_strand=False, value_col=value_col, rpm=rpm, drop_zero=True,
                value_out="Score",
            ).df.select(nm.CHROM_COL, nm.START_COL, nm.END_COL, "Score")
        if return_data:
            return GenomicRanges(runs)
        if path is None:
            raise ValueError("to_bigwig needs a path unless return_data=True")
        if chromosome_sizes is None:
            sizes = {
                r[0]: int(r[1])
                for r in self._df.groupBy(nm.CHROM_COL)
                .agg(F.max(nm.END_COL))
                .collect()
            }
        elif isinstance(chromosome_sizes, dict):
            sizes = {k: int(v) for k, v in chromosome_sizes.items()}
        else:
            cs = getattr(chromosome_sizes, "df", chromosome_sizes)
            sizes = {
                r[0]: int(r[1])
                for r in cs.select(nm.CHROM_COL, nm.END_COL).collect()
            }
        from pyranges_1_x_spark.sources.binary import to_bigwig_file

        to_bigwig_file(runs.withColumnRenamed("Score", "Value"), path, sizes)
        return None

    def to_bed(self, path, **kw) -> None:
        from pyranges_1_x_spark.sources import bed as _bed

        _bed.to_bed(self._df, path, **kw)

    def to_gtf(self, path) -> None:
        from pyranges_1_x_spark.sources import gtf as _gtf

        _gtf.to_gtf(self._df, path)

    def to_gff3(self, path) -> None:
        from pyranges_1_x_spark.sources import gtf as _gtf

        _gtf.to_gff3(self._df, path)

    def to_csv(self, path=None, sep=",", **kw):
        """Reference ``PyRanges.to_csv`` (core/out.py:111-141): write CSV to
        ``path`` (distributed), or return the CSV text when ``path`` is None
        (driver-side; small frames only)."""
        from pyranges_1_x_spark.sources import out as _out

        return _out.to_csv(self._df, path, sep, **kw)

    def get_transcript_sequence(self, sequences, group_by, **kw):
        from pyranges_1_x_spark.functions import seqs as _sq

        return _sq.get_transcript_sequence(self, sequences, group_by, **kw)


class _LociAccessor:
    """See ``GenomicRanges.loci``. Key grammar (loci_getter.py:17,24-58):
    chromosome string, strand string (+/-), position slice, or the 2-/3-tuples
    thereof. Strings not in {+,-} are chromosome names (the reference
    disambiguates the same way, loci_getter.py:158-170)."""

    _STRANDS = ("+", "-")

    def __init__(self, gr: GenomicRanges):
        self._gr = gr

    def __call__(self, chromosome=None, start=None, end=None, strand=None):
        return GenomicRanges(self._mask_filter(chromosome, strand, start, end))

    def _parse(self, key):
        """Positional key grammar, mirroring the reference exactly
        (loci_getter.py:34-54,105-152):

        - scalar: strand if in {+,-} (with a Strand column), else chromosome;
        - slice: coordinate range only;
        - 2-tuple ``(x, str)``: ``(chromosome, strand)`` unconditionally —
          even for strands outside {+,-} such as '.' (is_chrom_and_strand
          checks only that key[1] is a str);
        - 2-tuple ``(x, slice)``: x disambiguated like the scalar case;
        - 3-tuple: ``(chromosome, strand, slice)`` positionally.
        """
        if isinstance(key, list):
            raise TypeError(
                "The loci accessor does not accept a list. If you meant to retrieve "
                "columns, use get_with_loc_columns instead."
            )
        chrom = strand = None
        rng = slice(None)
        has_strand = nm.STRAND_COL in self._gr.df.columns

        def _scalar(p):
            # strand only if + or -, chromosome otherwise (loci_getter.py:144-152)
            return (None, p) if (p in self._STRANDS and has_strand) else (p, None)

        if isinstance(key, tuple):
            if len(key) == 2 and isinstance(key[1], str):
                chrom, strand = key
            elif len(key) == 2 and isinstance(key[1], slice):
                (chrom, strand), rng = _scalar(key[0]), key[1]
            elif len(key) == 3:
                chrom, strand, rng = key
            else:
                raise ValueError(
                    f"Indexing tuple for loci must be of length 2 or 3, but was {len(key)}."
                )
        elif isinstance(key, slice):
            rng = key
        else:
            chrom, strand = _scalar(key)
        return chrom, strand, rng

    def _mask(self, chrom, strand, start, end):
        m = F.lit(True)
        if chrom is not None:
            m = m & (F.col(nm.CHROM_COL) == chrom)
        if strand is not None:
            m = m & (F.col(nm.STRAND_COL) == strand)
        if start is not None:
            m = m & (F.col(nm.END_COL) > F.lit(start))
        if end is not None:
            m = m & (F.col(nm.START_COL) < F.lit(end))
        return m

    def _mask_filter(self, chrom, strand, start, end):
        return self._gr.df.filter(self._mask(chrom, strand, start, end))

    def __getitem__(self, key) -> GenomicRanges:
        chrom, strand, rng = self._parse(key)
        return GenomicRanges(self._mask_filter(chrom, strand, rng.start, rng.stop))

    def assign(self, key, **assignments) -> GenomicRanges:
        """Functional form of the reference's loci setter
        (loci_getter.py:56-58): rows matching ``key`` get the column
        ``assignments`` (values or Columns); other rows are unchanged."""
        chrom, strand, rng = self._parse(key)
        m = self._mask(chrom, strand, rng.start, rng.stop)
        d = self._gr.df
        for col, val in assignments.items():
            val = val if isinstance(val, F.Column) else F.lit(val)
            existing = F.col(col) if col in d.columns else F.lit(None)
            d = d.withColumn(col, F.when(m, val).otherwise(existing))
        return GenomicRanges(d)

    def __setitem__(self, key, value) -> None:
        """The reference's ``gr.loci[key] = value`` sugar (loci_getter.py:
        56-59, pyranges_main.py:343 doctest). Two accepted value shapes:

        - a ``GenomicRanges``/``DataFrame`` replacing the rows ``key``
          selects (the doctest's "same-sized PyRanges" form — here the
          match-count discipline is the caller's, since a lazy plan cannot
          afford an eager count): non-matching rows pass through, matching
          rows are swapped for ``value``'s rows by column name;
        - a dict of ``column -> value/Column``, delegating to ``assign``
          (the loc-based column-assignment idiom two doctests down).

        Mutates the parent in place, as the reference does.
        """
        if isinstance(value, dict):
            self._gr._df = self.assign(key, **value).df
            return
        vdf = value.df if isinstance(value, GenomicRanges) else value
        if not isinstance(vdf, DataFrame):
            raise TypeError(
                "loci assignment takes a GenomicRanges/DataFrame (row "
                "replacement) or a dict of column assignments; got "
                f"{type(value).__name__}"
            )
        chrom, strand, rng = self._parse(key)
        keep = self._gr.df.filter(~self._mask(chrom, strand, rng.start, rng.stop))
        self._gr._df = keep.unionByName(
            vdf.select(*self._gr.df.columns), allowMissingColumns=False
        )


class GenomicRangesGroupBy:
    """Auto-rewrapping groupBy facade (see ``GenomicRanges.group_by``)."""

    def __init__(self, gdf):
        self._g = gdf

    def __getattr__(self, item):
        attr = getattr(self._g, item)
        if not callable(attr):
            return attr

        def wrapper(*args, **kwargs):
            res = attr(*args, **kwargs)
            return GenomicRanges.wrap(res) if isinstance(res, DataFrame) else res

        return wrapper
