"""extend_orfs — grow CDS intervals to complete open reading frames.

Reference: ``ext/orfs.py:132-520`` (pyfaidx + numpy chunk loop). Semantics
reproduced from its doctests:

- downstream: extend to (and including) the first in-frame stop codon; none
  within the chromosome => no extension, or the largest 3-nt multiple if
  ``keep_off_bounds``.
- upstream: scan in-frame codons away from the CDS until the first stop (or
  the chromosome edge); extend to the LEFTMOST start codon in that window
  (with ``starts=[]``, to the codon just before the stop). No stop found and
  ``keep_off_bounds`` => the largest 3-nt multiple, ignoring start codons
  (the doctest's off-bounds case extends 18, past its ATG at 12).
- '-' strand rows are handled in transcript orientation (reverse complement).
- with ``group_by``, rows form multi-exon transcripts: only the boundary
  exons (min Start / max End) move; the codon frame continues from the
  spliced CDS, which assumes total CDS length % 3 == 0 (the reference warns
  on violation; we document instead — a lazy plan cannot afford the eager
  validation scan).

Physical strategy: the whole operator is Catalyst expressions — the codon
scan is ``filter``/``array_min``/``array_max`` over an in-frame index array
against the broadcast per-chromosome sequence (same posture as
``translate_cds``, functions/seqs.py:40). No Python UDF, no shuffle beyond
the per-group boundary aggregate when ``group_by`` is set. Sequences come
from a (Chromosome, Sequence) table as in ``get_sequence`` — the pyfaidx
stand-in; chromosome strings are broadcast, so per-row scans never shuffle
sequence data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges

STARTS = ("ATG",)
STOPS = ("TAG", "TGA", "TAA")

_SEQ = "__chromseq__"


def _codon(pos: Column, rc: bool) -> Column:
    """In-frame codon at 1-based position `pos` of the chromosome string,
    reverse-complemented into transcript orientation when ``rc``."""
    c = F.upper(F.col(_SEQ).substr(pos.cast("int"), F.lit(3)))
    return F.reverse(F.translate(c, "ACGTacgt", "TGCAtgca")) if rc else c


def _idx(m: Column) -> Column:
    """[1..m] as array<long>; empty when m < 1 (sequence() would descend)."""
    return F.when(m >= 1, F.sequence(F.lit(1).cast("long"), m)).otherwise(
        F.expr("cast(array() as array<bigint>)")
    )


def _scan(
    pos_of,  # Callable[[Column], Column]: codon index -> 1-based seq position
    rc: bool,
    m: Column,
    starts: tuple[str, ...],
    stops: tuple[str, ...],
    *,
    upstream: bool,
    keep_off_bounds: bool,
) -> Column:
    """Extension length in nt for one direction of one row/group."""
    idx = _idx(m)
    in_stops = lambda i: _codon(pos_of(i), rc).isin(*stops)  # noqa: E731
    stop_i = F.array_min(F.filter(idx, in_stops))
    if not upstream:
        ext = F.when(stop_i.isNotNull(), 3 * stop_i)
        if keep_off_bounds:
            ext = ext.otherwise(3 * m)
        return F.coalesce(ext, F.lit(0)).cast("long")
    limit = F.coalesce(stop_i - 1, m)
    if starts:
        in_starts = lambda i: _codon(pos_of(i), rc).isin(*starts)  # noqa: E731
        start_i = F.array_max(F.filter(idx, lambda i: in_starts(i) & (i <= limit)))
        ext = F.coalesce(3 * start_i, F.lit(0))
    else:
        ext = F.when(stop_i.isNotNull(), 3 * limit).otherwise(F.lit(0))
    if keep_off_bounds:
        ext = F.when(stop_i.isNull(), 3 * m).otherwise(ext)
    return ext.cast("long")


def extend_orfs(
    self: GenomicRanges,
    sequences,
    group_by: str | list[str] | None = None,
    *,
    direction: str | list[str] | None = None,
    starts: tuple[str, ...] = STARTS,
    stops: tuple[str, ...] = STOPS,
    keep_off_bounds: bool = False,
    record_extensions: bool = False,
    seq_col: str = "Sequence",
    max_scan_nt: int | None = None,
) -> GenomicRanges:
    """See module docstring. ``sequences`` is a (Chromosome, ``seq_col``)
    DataFrame; intervals must carry a valid Strand column.

    ``max_scan_nt`` bounds each direction's codon scan (rounded down to a
    codon multiple) — the declarative analog of the reference's
    ``chunk_size`` loop (ext/orfs.py:142): the expression scan has no early
    exit, so an unbounded scan evaluates O(chromosome length) codons per
    transcript even when the answer is 2 codons away. A stop beyond the cap
    is treated as not found (off-bounds). None = scan to the chromosome
    edge, reference-exact."""
    if not stops:
        raise AssertionError("At least one stop codon must be provided.")
    if not all(len(p) == 3 for p in tuple(starts) + tuple(stops)):
        raise AssertionError("Ensure that all patterns have a length of 3 nt.")
    if not self.has_strand:
        raise AssertionError("Intervals must have valid strands to call extend_orfs")
    dirs = ["up", "down"] if direction is None else (
        [direction] if isinstance(direction, str) else list(direction)
    )
    if not set(dirs) <= {"up", "down"}:
        raise ValueError(f"direction must be 'up', 'down' or both, got {dirs!r}")
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])

    seqs = sequences.select(
        F.col(nm.CHROM_COL), F.col(seq_col).alias(_SEQ)
    ).withColumn("__seqlen__", F.length(_SEQ).cast("long"))

    keys = [nm.CHROM_COL, nm.STRAND_COL, *gb]
    if gb:
        # one boundary row per transcript; extensions join back on the
        # deterministic content keys (no generated ids across branches).
        base = self.df.groupBy(*keys).agg(
            F.min(nm.START_COL).alias("__gs__"), F.max(nm.END_COL).alias("__ge__")
        )
    else:
        # per-row mode: each interval is its own group — compute extensions
        # inline on the row, no second branch, no join.
        base = self.df.withColumn("__gs__", F.col(nm.START_COL)).withColumn(
            "__ge__", F.col(nm.END_COL)
        )

    b = base.join(F.broadcast(seqs), on=nm.CHROM_COL, how="left")
    gs, ge, slen = F.col("__gs__"), F.col("__ge__"), F.col("__seqlen__")
    neg = F.col(nm.STRAND_COL) == "-"

    # Codon index i counts away from the CDS boundary in transcript
    # orientation; each case maps i to a 1-based genomic substring position.
    m_right = F.floor((slen - ge) / 3).cast("long")  # codons after End
    m_left = F.floor(gs / 3).cast("long")  # codons before Start
    if max_scan_nt is not None:
        cap = F.lit(max_scan_nt // 3).cast("long")
        m_right = F.least(m_right, cap)
        m_left = F.least(m_left, cap)
    pos_right = lambda i: ge + 3 * (i - 1) + 1  # noqa: E731
    pos_left = lambda i: gs - 3 * i + 1  # noqa: E731

    def _dir(upstream: bool) -> Column:
        # upstream on '+' and downstream on '-' scan LEFT of Start;
        # downstream on '+' and upstream on '-' scan RIGHT of End.
        plus_left = upstream
        common = dict(
            starts=tuple(starts), stops=tuple(stops),
            upstream=upstream, keep_off_bounds=keep_off_bounds,
        )
        on_plus = _scan(
            pos_left if plus_left else pos_right, False,
            m_left if plus_left else m_right, **common,
        )
        on_minus = _scan(
            pos_right if plus_left else pos_left, True,
            m_right if plus_left else m_left, **common,
        )
        return F.when(neg, on_minus).otherwise(on_plus)

    ext_up = _dir(True) if "up" in dirs else F.lit(0).cast("long")
    ext_down = _dir(False) if "down" in dirs else F.lit(0).cast("long")
    b = b.withColumn("__eu__", ext_up).withColumn("__ed__", ext_down)

    if gb:
        out = self.df.join(
            b.select(*keys, "__gs__", "__ge__", "__eu__", "__ed__"), on=keys, how="left"
        )
    else:
        out = b.drop(_SEQ, "__seqlen__")

    # Genomic left/right extension from transcript up/down.
    left_ext = F.when(neg, F.col("__ed__")).otherwise(F.col("__eu__"))
    right_ext = F.when(neg, F.col("__eu__")).otherwise(F.col("__ed__"))
    is_left_row = F.col(nm.START_COL) == F.col("__gs__")
    is_right_row = F.col(nm.END_COL) == F.col("__ge__")
    out = out.withColumn(
        nm.START_COL,
        F.when(is_left_row, F.col(nm.START_COL) - left_ext).otherwise(F.col(nm.START_COL)),
    ).withColumn(
        nm.END_COL,
        F.when(is_right_row, F.col(nm.END_COL) + right_ext).otherwise(F.col(nm.END_COL)),
    )
    if record_extensions:
        out = out.withColumn("extension_up", F.col("__eu__")).withColumn(
            "extension_down", F.col("__ed__")
        )
    return GenomicRanges(
        out.drop("__gs__", "__ge__", "__eu__", "__ed__", _SEQ, "__seqlen__")
    )
