"""Property-based suite: random interval frames vs pure-Python brute-force
oracles for the core interval operators.

Mirrors the reference's test strategy (SURVEY.md §5: the reference kept a
``tests/property_based`` hypothesis suite driving random frames through
merge/overlap/subtract/nearest and comparing against naive recomputation —
``docs/developer_guide.rst:345-350``). Here each hypothesis example builds
small Spark frames and compares against O(n·m) Python recomputation, so the
operators' binned/bucketed plans are exercised against an implementation-free
statement of the semantics — including the edge cases hypothesis likes:
zero-length intervals, duplicate rows, touching endpoints, single-chromosome
skew, and empty sides.

Spark jobs per example are the expensive part: examples are capped low
(settings below) — breadth of shrinkable structure matters more than raw
example count, and the oracle gate + golden tests carry volume coverage.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyranges_1_x_spark.core import GenomicRanges

# One interval: (chrom, start, length, strand, score). Lengths include 0
# (empty interval: overlaps nothing under half-open semantics).
_interval = st.tuples(
    st.sampled_from(["chr1", "chr2"]),
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=0, max_value=25),
    st.sampled_from(["+", "-"]),
    st.integers(min_value=0, max_value=5),
)

_frame = st.lists(_interval, min_size=0, max_size=12)

#: Deep-hunt switch: SPARK_GRAFT_HYP_EXPLORE=N runs N RANDOM examples per
#: test instead of the pinned 8 (derandomize=True would otherwise ignore
#: any seed). The default stays reproducible so the CI gate can't flake on
#: a genuinely-new falsifying example; the explore mode is how new bugs
#: get hunted between rounds (r7 found 4 real ones this way).
_EXPLORE = int(__import__("os").environ.get("SPARK_GRAFT_HYP_EXPLORE", "0"))

_SETTINGS = settings(
    max_examples=_EXPLORE or 8,
    deadline=None,
    derandomize=not _EXPLORE,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _to_gr(spark, rows):
    pdf = pd.DataFrame(
        [(c, s, s + ln, st_, sc) for (c, s, ln, st_, sc) in rows],
        columns=["Chromosome", "Start", "End", "Strand", "Score"],
    )
    if pdf.empty:
        df = spark.createDataFrame(
            [], "Chromosome string, Start long, End long, Strand string, Score long"
        )
    else:
        df = spark.createDataFrame(pdf)
    return GenomicRanges(df)


def _rows(gr, cols=("Chromosome", "Start", "End")):
    out = gr.df.select(*cols).toPandas()
    return sorted(map(tuple, out.values))


def _overlaps(a, b):
    """Half-open overlap of (chrom,start,end[,strand]) tuples, same chrom."""
    return a[0] == b[0] and a[1] < b[2] and b[1] < a[2]


def _merge_py(rows, use_strand):
    """Brute-force merge: union-find on the STRICT-overlap graph, then span.

    Engine (and reference) semantics probed explicitly: only strictly
    overlapping intervals merge — bookended intervals ([0,3)+[3,6)) stay
    separate, a zero-length point [p,p) is absorbed only when strictly
    inside an interval (not at its boundary), and duplicate zero-length
    rows all survive as their own islands.
    """
    ivs = [
        (c, s, s + ln) + ((st_,) if use_strand else ())
        for (c, s, ln, st_, _) in rows
    ]
    parent = list(range(len(ivs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            a, b = ivs[i], ivs[j]
            same = a[0] == b[0] and (not use_strand or a[3] == b[3])
            if same and a[1] < b[2] and b[1] < a[2]:
                parent[find(i)] = find(j)
    comps = {}
    for i, iv in enumerate(ivs):
        comps.setdefault(find(i), []).append(iv)
    out = []
    for group in comps.values():
        key = group[0][:1] + (group[0][3:] if use_strand else ())
        start = min(g[1] for g in group)
        end = max(g[2] for g in group)
        out.append((key[0], start, end) + (key[1:] if use_strand else ()))
    return sorted(out)


@_SETTINGS
@given(rows=_frame, use_strand=st.booleans())
def test_merge_overlaps_matches_bruteforce(spark, rows, use_strand):
    got = _merge_py(rows, use_strand)
    cols = ("Chromosome", "Start", "End") + (("Strand",) if use_strand else ())
    merged = _to_gr(spark, rows).merge_overlaps(use_strand=use_strand)
    assert _rows(merged, cols) == got


@_SETTINGS
@given(a=_frame, b=_frame)
def test_overlap_semi_and_anti_match_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    at = [(c, s, s + ln) for (c, s, ln, _, _) in a]
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]
    keep = sorted(x for x in at if any(_overlaps(x, y) for y in bt))
    drop = sorted(x for x in at if not any(_overlaps(x, y) for y in bt))
    assert _rows(ga.overlap(gb, strand_behavior="ignore")) == keep
    assert (
        _rows(ga.complement_overlaps(gb, strand_behavior="ignore")) == drop
    )


@_SETTINGS
@given(a=_frame, b=_frame)
def test_count_overlaps_matches_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    at = [(c, s, s + ln) for (c, s, ln, _, _) in a]
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]
    want = sorted(
        (x[0], x[1], x[2], sum(1 for y in bt if _overlaps(x, y))) for x in at
    )
    out = ga.count_overlaps(gb, strand_behavior="ignore")
    got = _rows(out, ("Chromosome", "Start", "End", "Count"))
    assert [tuple(map(int, r[1:])) + () for r in got] == [
        tuple(map(int, r[1:])) for r in want
    ] and [r[0] for r in got] == [r[0] for r in want]


@_SETTINGS
@given(a=_frame, b=_frame)
def test_subtract_overlaps_matches_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b if ln > 0]
    want = []
    for c, s, ln, _, _ in a:
        if ln == 0:
            # subtract emits only NONEMPTY residual sub-intervals: a
            # zero-length row [p,p) denotes the empty set, so it never
            # produces output (engine: the gap/tail filters require
            # start < end). Pinned here since the reference kernel is not
            # runnable in this environment to compare.
            continue
        # subtract the union of b from [s, s+ln): sweep the kept runs
        cuts = sorted((y[1], y[2]) for y in bt if _overlaps((c, s, s + ln), y))
        pos, e = s, s + ln
        for cs, ce in cuts:
            if cs > pos:
                want.append((c, pos, min(cs, e)))
            pos = max(pos, ce)
            if pos >= e:
                break
        if pos < e:
            want.append((c, pos, e))
    got = _rows(ga.subtract_overlaps(gb, strand_behavior="ignore"))
    assert got == sorted(want)


@_SETTINGS
@given(a=_frame, b=_frame)
def test_nearest_matches_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]

    def dist(x, y):
        if _overlaps(x, y):
            return 0
        if y[1] >= x[2]:
            return y[1] - x[2] + 1
        return x[1] - y[2] + 1

    want = []
    for c, s, ln, _, _ in a:
        x = (c, s, s + ln)
        cands = [y for y in bt if y[0] == c]
        if not cands:
            continue
        want.append((c, s, s + ln, min(dist(x, y) for y in cands)))
    out = ga.nearest_ranges(gb, strand_behavior="ignore")
    got = sorted(
        set(
            map(
                tuple,
                out.df.select(
                    "Chromosome", "Start", "End", "Distance"
                ).toPandas().values,
            )
        )
    )
    # compare the per-row minimal distance (ties may multiply rows upstream)
    assert sorted(set(got)) == sorted(set(want))


def _merge_tuples(ivs):
    """Strict-overlap merge of (c,s,e) tuples (see _merge_py)."""
    parent = list(range(len(ivs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            if _overlaps(ivs[i], ivs[j]):
                parent[find(i)] = find(j)
    comps = {}
    for i, iv in enumerate(ivs):
        comps.setdefault(find(i), []).append(iv)
    return sorted(
        (g[0][0], min(x[1] for x in g), max(x[2] for x in g))
        for g in comps.values()
    )


@_SETTINGS
@given(a=_frame, b=_frame)
def test_set_union_matches_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    allt = [(c, s, s + ln) for (c, s, ln, _, _) in a + b]
    got = _rows(ga.set_union_overlaps(gb, strand_behavior="ignore"))
    assert got == _merge_tuples(allt)


@_SETTINGS
@given(a=_frame, b=_frame)
def test_set_intersect_matches_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    ia = _merge_tuples([(c, s, s + ln) for (c, s, ln, _, _) in a])
    ib = _merge_tuples([(c, s, s + ln) for (c, s, ln, _, _) in b])
    want = sorted(
        (x[0], max(x[1], y[1]), min(x[2], y[2]))
        for x in ia
        for y in ib
        if _overlaps(x, y)
    )
    got = _rows(ga.set_intersect_overlaps(gb, strand_behavior="ignore"))
    assert got == want


@_SETTINGS
@given(a=_frame, b=_frame)
def test_intersect_overlaps_matches_bruteforce(spark, a, b):
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    at = [(c, s, s + ln, sc) for (c, s, ln, _, sc) in a]
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]
    want = sorted(
        (x[0], max(x[1], y[1]), min(x[2], y[2]), x[3])
        for x in at
        for y in bt
        if _overlaps(x[:3], y)
    )
    out = ga.intersect_overlaps(gb, strand_behavior="ignore")
    got = _rows(out, ("Chromosome", "Start", "End", "Score"))
    assert got == want


@_SETTINGS
@given(rows=_frame)
def test_cluster_overlaps_partition_matches_bruteforce(spark, rows):
    """Cluster ids are arbitrary labels; compare the PARTITION they induce:
    the multiset of row-groups must equal strict-overlap union-find groups
    (per chromosome, unstranded)."""
    g = _to_gr(spark, rows)
    ivs = [(c, s, s + ln, i) for i, (c, s, ln, _, _) in enumerate(rows)]
    parent = list(range(len(ivs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            if _overlaps(ivs[i][:3], ivs[j][:3]):
                parent[find(i)] = find(j)
    groups = {}
    for i, iv in enumerate(ivs):
        groups.setdefault(find(i), []).append(iv[:3])
    want = sorted(sorted(g_) for g_ in groups.values())

    out = (
        g.cluster_overlaps(use_strand=False)
        .df.select("Chromosome", "Start", "End", "Cluster")
        .toPandas()
    )
    clusters = {}
    for c, s, e, cl in out.values:
        clusters.setdefault((c, cl), []).append((c, int(s), int(e)))
    got = sorted(sorted(g_) for g_ in clusters.values())
    assert got == want


@_SETTINGS
@given(rows=_frame, between=st.booleans())
def test_split_overlaps_matches_bruteforce(spark, rows, between):
    """Atomize at every boundary: adjacent distinct-point segments, kept when
    covered by >= 1 input interval (always kept with between=True)."""
    g = _to_gr(spark, rows)
    by_chrom = {}
    for c, s, ln, _, _ in rows:
        by_chrom.setdefault(c, []).append((s, s + ln))
    want = []
    for c, ivs in by_chrom.items():
        pts = sorted({p for iv in ivs for p in iv})
        for p, q in zip(pts, pts[1:]):
            covered = any(s <= p and q <= e for s, e in ivs)
            if covered or between:
                want.append((c, p, q))
    got = _rows(g.split_overlaps(use_strand=False, between=between))
    assert got == sorted(want)


@_SETTINGS
@given(rows=_frame, w=st.integers(min_value=1, max_value=9))
def test_tile_ranges_matches_bruteforce(spark, rows, w):
    """Genome-aligned tiles: k*w..(k+1)*w for floor(s/w) <= k <= max(floor(s/w),
    floor((e-1)/w)); zero-length rows emit their single anchor tile."""
    g = _to_gr(spark, rows)
    want = []
    for c, s, ln, st_, sc in rows:
        e = s + ln
        lo = s // w
        hi = max(lo, (e - 1) // w)
        for k in range(lo, hi + 1):
            want.append((c, k * w, (k + 1) * w))
    got = _rows(g.tile_ranges(w))
    assert got == sorted(want)


@_SETTINGS
@given(rows=_frame, w=st.integers(min_value=1, max_value=9))
def test_window_ranges_matches_bruteforce(spark, rows, w):
    """5'-anchored chunks of width w (reference doctest
    pyranges_main.py:5100-5140): '-' strand slices DESCENDING from End so
    the short remainder lands at the left end; zero-length rows emit
    themselves."""
    g = _to_gr(spark, rows)
    want = []
    for c, s, ln, st_, sc in rows:
        e = s + ln
        if ln == 0:
            want.append((c, s, s))
            continue
        if st_ == "-":
            p = e
            while p > s:
                want.append((c, max(p - w, s), p))
                p -= w
        else:
            p = s
            while p < e:
                want.append((c, p, min(p + w, e)))
                p += w
    got = _rows(g.window_ranges(w))
    assert got == sorted(want)


@_SETTINGS
@given(
    rows=_frame,
    e5=st.integers(min_value=0, max_value=7),
    e3=st.integers(min_value=0, max_value=7),
)
def test_extend_ranges_matches_bruteforce(spark, rows, e5, e3):
    """Strand-aware 5'/3' padding: on '-' the 5' end is End; Start floors
    at 0."""
    g = _to_gr(spark, rows)
    want = sorted(
        (
            c,
            max(0, s - (e3 if st_ == "-" else e5)),
            s + ln + (e5 if st_ == "-" else e3),
        )
        for (c, s, ln, st_, sc) in rows
    )
    got = _rows(g.extend_ranges(ext_5=e5, ext_3=e3, use_strand=True))
    assert got == want


@_SETTINGS
@given(a=_frame, b=_frame)
def test_join_inner_matches_bruteforce(spark, a, b):
    """Inner join_overlaps: one output row per strictly-overlapping pair,
    with the match's coordinates as Start_b/End_b."""
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    at = [(c, s, s + ln) for (c, s, ln, _, _) in a]
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]
    want = sorted(
        (x[0], x[1], x[2], y[1], y[2])
        for x in at
        for y in bt
        if _overlaps(x, y)
    )
    out = ga.join_overlaps(gb, strand_behavior="ignore")
    got = _rows(out, ("Chromosome", "Start", "End", "Start_b", "End_b"))
    assert got == want


@_SETTINGS
@given(rows=_frame)
def test_outer_ranges_matches_bruteforce(spark, rows):
    """Per-(chrom,strand) span with count."""
    g = _to_gr(spark, rows)
    spans = {}
    for c, s, ln, st_, _ in rows:
        k = (c, st_)
        lo, hi, n = spans.get(k, (s, s + ln, 0))
        spans[k] = (min(lo, s), max(hi, s + ln), n + 1)
    want = sorted((c, lo, hi, st_, n) for (c, st_), (lo, hi, n) in spans.items())
    out = g.outer_ranges(use_strand=True, count_col="Count")
    got = _rows(out, ("Chromosome", "Start", "End", "Strand", "Count"))
    assert [tuple(r[:3]) + (r[3], int(r[4])) for r in got] == want


@_SETTINGS
@given(rows=_frame, slack=st.integers(min_value=0, max_value=5))
def test_max_disjoint_matches_bruteforce(spark, rows, slack):
    """Greedy earliest-End-first per (chrom,strand); next accepted iff
    Start >= last_End + slack; ties broken by the full row ordering."""
    g = _to_gr(spark, rows)
    by_key = {}
    for c, s, ln, st_, sc in rows:
        by_key.setdefault((c, st_), []).append((s + ln, s, c, st_, sc))
    want = []
    for (c, st_), ivs in by_key.items():
        last = None
        for e, s, c_, st2, sc in sorted(ivs):
            if last is None or s >= last + slack:
                want.append((c_, s, e, st2, sc))
                last = e
    out = g.max_disjoint_overlaps(use_strand=True, slack=slack)
    got = _rows(out, ("Chromosome", "Start", "End", "Strand", "Score"))
    assert got == sorted(want)


@_SETTINGS
@given(rows=_frame)
def test_complement_matches_bruteforce(spark, rows):
    """Gaps strictly between merged islands per chromosome (no chromsizes:
    no leading/trailing gaps)."""
    g = _to_gr(spark, rows)
    merged = _merge_tuples([(c, s, s + ln) for (c, s, ln, _, _) in rows])
    by_chrom = {}
    for c, s, e in merged:
        by_chrom.setdefault(c, []).append((s, e))
    want = []
    for c, ivs in by_chrom.items():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            if s2 > e1:
                want.append((c, e1, s2))
    got = _rows(g.complement_ranges(use_strand=False))
    assert got == sorted(want)


def test_complement_zero_length_start_tie(spark):
    """Regression: a zero-length island tying a neighbor's Start must not
    swallow the real gap after that neighbor (lead() order pinned to
    (Start, End))."""
    rows = [("chr1", 5, 0, "+", 0), ("chr1", 5, 4, "+", 0), ("chr1", 12, 3, "+", 0)]
    got = _rows(_to_gr(spark, rows).complement_ranges(use_strand=False))
    assert got == [("chr1", 9, 12)]


@_SETTINGS
@given(rows=_frame, length=st.integers(min_value=1, max_value=8),
       gap=st.integers(min_value=0, max_value=4))
def test_upstream_downstream_match_bruteforce(spark, rows, length, gap):
    """Strand-aware flanks clipped at 0; empty (fully-clipped) flanks drop."""
    g = _to_gr(spark, rows)

    def clip(s, e):
        s, e = max(0, s), max(0, e)
        return (s, e) if s < e else None

    up, dn = [], []
    for c, s, ln, st_, _ in rows:
        e = s + ln
        if st_ == "-":
            u = clip(e + gap, e + gap + length)
            d = clip(s - gap - length, s - gap)
        else:
            u = clip(s - gap - length, s - gap)
            d = clip(e + gap, e + gap + length)
        if u:
            up.append((c, u[0], u[1], st_))
        if d:
            dn.append((c, d[0], d[1], st_))
    cols = ("Chromosome", "Start", "End", "Strand")
    assert _rows(g.upstream(length, gap=gap), cols) == sorted(up)
    assert _rows(g.downstream(length, gap=gap), cols) == sorted(dn)


@_SETTINGS
@given(rows=_frame)
def test_five_three_end_match_bruteforce(spark, rows):
    """Length-1 interval at the strand-aware 5'/3' end of each row."""
    g = _to_gr(spark, rows)
    five, three = [], []
    for c, s, ln, st_, _ in rows:
        if ln == 0:
            # slice_ranges(0,1) of an empty interval is empty -> dropped
            continue
        e = s + ln
        if st_ == "-":
            five.append((c, max(s, e - 1), e, st_))
            three.append((c, s, min(e, s + 1), st_))
        else:
            five.append((c, s, min(e, s + 1), st_))
            three.append((c, max(s, e - 1), e, st_))
    cols = ("Chromosome", "Start", "End", "Strand")
    assert _rows(g.five_end(), cols) == sorted(five)
    assert _rows(g.three_end(), cols) == sorted(three)


@_SETTINGS
@given(rows=_frame)
def test_group_cumsum_matches_bruteforce(spark, rows):
    """use_strand=False, grouped by Score: per (chrom, score) group, rows in
    (Start, End) order get [cum, cum+len) local coordinates. Compared as a
    multiset (tied duplicate rows swap positions freely but yield the same
    output multiset)."""
    g = _to_gr(spark, rows)
    by = {}
    for c, s, ln, st_, sc in rows:
        by.setdefault((c, sc), []).append((s, s + ln))
    want = []
    for (c, sc), ivs in by.items():
        cum = 0
        for s, e in sorted(ivs):
            want.append((c, cum, cum + (e - s), sc))
            cum += e - s
    out = g.group_cumsum(group_by="Score", use_strand=False)
    got = _rows(out, ("Chromosome", "Start", "End", "Score"))
    assert sorted(got) == sorted(want)


@_SETTINGS
@given(rows=_frame, size=st.integers(min_value=1, max_value=70))
def test_clip_ranges_matches_bruteforce(spark, rows, size):
    g = _to_gr(spark, rows)
    import pandas as pd

    sizes = spark.createDataFrame(
        pd.DataFrame({"Chromosome": ["chr1", "chr2"], "End": [size, size]})
    )
    clip_want, rm_want = [], []
    for c, s, ln, st_, _ in rows:
        e = s + ln
        cs, ce = max(0, s), min(e, size)
        if cs < ce:
            clip_want.append((c, cs, ce))
        if s >= 0 and e <= size:
            rm_want.append((c, s, e))
    assert _rows(g.clip_ranges(sizes)) == sorted(clip_want)
    assert _rows(g.clip_ranges(sizes, mode="remove")) == sorted(rm_want)


@_SETTINGS
@given(rows=_frame)
def test_to_coverage_matches_bruteforce(spark, rows):
    """Depth runs: at every integer position, the engine's covering run value
    equals the brute-force count of intervals spanning that position; runs
    tile the boundary span with no overlaps."""
    g = _to_gr(spark, rows)
    out = g.to_coverage(use_strand=False).df.toPandas()
    ivs = {}
    for c, s, ln, _, _ in rows:
        ivs.setdefault(c, []).append((s, s + ln))
    for c, chrom_ivs in ivs.items():
        runs = sorted(
            (int(r.Start), int(r.End), int(r.Value))
            for r in out[out.Chromosome == c].itertuples()
        )
        lo = min(s for s, _ in chrom_ivs)
        hi = max(e for _, e in chrom_ivs)
        # runs tile [lo, hi) contiguously
        if lo < hi:
            assert runs[0][0] == lo and runs[-1][1] == hi
            for (s1, e1, _), (s2, e2, _) in zip(runs, runs[1:]):
                assert e1 == s2
        for p in range(lo, hi):
            want = sum(1 for s, e in chrom_ivs if s <= p < e)
            got = [v for s, e, v in runs if s <= p < e]
            assert len(got) == 1 and got[0] == want, (c, p, got, want)


@_SETTINGS
@given(a=_frame, b=_frame)
def test_join_left_padding_matches_bruteforce(spark, a, b):
    """how='left': one row per overlapping pair plus ONE null-padded row per
    matchless left row."""
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    at = [(c, s, s + ln) for (c, s, ln, _, _) in a]
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]
    want = []
    for x in at:
        hits = [y for y in bt if _overlaps(x, y)]
        if hits:
            want.extend((x[0], x[1], x[2], y[1], y[2]) for y in hits)
        else:
            want.append((x[0], x[1], x[2], None, None))
    out = ga.join_overlaps(gb, strand_behavior="ignore", join_type="left").df
    pdf = out.select("Chromosome", "Start", "End", "Start_b", "End_b").toPandas()
    got = sorted(
        (
            r.Chromosome,
            int(r.Start),
            int(r.End),
            None if pd.isna(r.Start_b) else int(r.Start_b),
            None if pd.isna(r.End_b) else int(r.End_b),
        )
        for r in pdf.itertuples()
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert got == sorted(want, key=key) or sorted(got, key=key) == sorted(want, key=key)


@_SETTINGS
@given(a=_frame, b=_frame, k=st.integers(min_value=1, max_value=3))
def test_nearest_k_and_directions_match_bruteforce(spark, a, b, k):
    """k-nearest distance multisets per self row, and the forward/backward
    restricted variants (k=1), vs brute force."""
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]

    def dist(x, y):
        if _overlaps(x, y):
            return 0
        if y[1] >= x[2]:
            return y[1] - x[2] + 1
        return x[1] - y[2] + 1

    # k nearest: per self row the k smallest candidate distances (multiset)
    want_k = []
    for c, s, ln, _, _ in a:
        x = (c, s, s + ln)
        ds = sorted(dist(x, y) for y in bt if y[0] == c)[:k]
        for d in ds:
            want_k.append((c, s, s + ln, d))
    out = ga.nearest_ranges(gb, strand_behavior="ignore", k=k).df
    got_k = sorted(
        map(
            tuple,
            out.select("Chromosome", "Start", "End", "Distance").toPandas().values,
        )
    )
    assert got_k == sorted(want_k)

    # forward: candidates with Start >= self End; backward: End <= self Start
    want_f, want_b = [], []
    for c, s, ln, _, _ in a:
        x = (c, s, s + ln)
        f = [y[1] - x[2] + 1 for y in bt if y[0] == c and y[1] >= x[2]]
        bb = [x[1] - y[2] + 1 for y in bt if y[0] == c and y[2] <= x[1]]
        if f:
            want_f.append((c, s, s + ln, min(f)))
        if bb:
            want_b.append((c, s, s + ln, min(bb)))
    for direction, want in (("forward", want_f), ("backward", want_b)):
        o = ga.nearest_ranges(
            gb, strand_behavior="ignore", direction=direction, exclude_overlaps=True
        ).df
        got = sorted(
            map(
                tuple,
                o.select("Chromosome", "Start", "End", "Distance").toPandas().values,
            )
        )
        assert got == sorted(want), direction


@_SETTINGS
@given(rows=_frame, slack=st.integers(min_value=1, max_value=6))
def test_merge_overlaps_slack_matches_bruteforce(spark, rows, slack):
    """slack>0 widens the island rule: rows join when within slack of each
    other (Start < other End + slack, pairwise-transitively)."""
    ivs = [(c, s, s + ln) for (c, s, ln, _, _) in rows]
    parent = list(range(len(ivs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            x, y = ivs[i], ivs[j]
            if x[0] == y[0] and x[1] < y[2] + slack and y[1] < x[2] + slack:
                parent[find(i)] = find(j)
    comps = {}
    for i, iv in enumerate(ivs):
        comps.setdefault(find(i), []).append(iv)
    want = sorted(
        (g[0][0], min(x[1] for x in g), max(x[2] for x in g))
        for g in comps.values()
    )
    merged = _to_gr(spark, rows).merge_overlaps(use_strand=False, slack=slack)
    assert _rows(merged) == want


@_SETTINGS
@given(a=_frame, b=_frame)
def test_join_outer_padding_matches_bruteforce(spark, a, b):
    """how='outer': inner pairs + one null-padded row per matchless LEFT row
    + one per matchless RIGHT row (right-only rows have null key columns,
    like the reference's outer doctest)."""
    ga, gb = _to_gr(spark, a), _to_gr(spark, b)
    at = [(c, s, s + ln) for (c, s, ln, _, _) in a]
    bt = [(c, s, s + ln) for (c, s, ln, _, _) in b]
    want = []
    for x in at:
        hits = [y for y in bt if _overlaps(x, y)]
        if hits:
            want.extend((x[0], x[1], x[2], y[1], y[2]) for y in hits)
        else:
            want.append((x[0], x[1], x[2], None, None))
    for y in bt:
        if not any(_overlaps(x, y) for x in at):
            want.append((None, None, None, y[1], y[2]))
    out = ga.join_overlaps(gb, strand_behavior="ignore", join_type="outer").df
    pdf = out.select("Chromosome", "Start", "End", "Start_b", "End_b").toPandas()

    def cell(v):
        return None if pd.isna(v) else (int(v) if not isinstance(v, str) else v)

    got = [tuple(cell(v) for v in row) for row in pdf.values]
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


# ---------------------------------------------------------------------------
# Mapping family (map_to_global / map_to_local) — VERDICT r7 #6.
# ---------------------------------------------------------------------------

@st.composite
def _tx_world(draw):
    """Random transcript annotation + transcript-local query intervals.

    Exons are strictly disjoint WITHIN a transcript (gaps >= 1, so no Start
    ties — the undecidable tiebreak order never triggers) and transcript
    territories are disjoint per chromosome (a per-chromosome cursor), so
    the global->local inverse is unambiguous for the round-trip test.
    Local intervals include zero-length and exon-boundary-straddling spans.
    """
    n_tx = draw(st.integers(min_value=1, max_value=3))
    cursor: dict = {}
    anns, locs = [], []
    for t in range(n_tx):
        chrom = draw(st.sampled_from(["chr1", "chr2"]))
        strand = draw(st.sampled_from(["+", "-"]))
        pos = cursor.get(chrom, 0)
        exons = []
        for _ in range(draw(st.integers(min_value=1, max_value=4))):
            pos += draw(st.integers(min_value=1, max_value=5))
            ln = draw(st.integers(min_value=1, max_value=8))
            exons.append((pos, pos + ln))
            pos += ln
        cursor[chrom] = pos
        tx = f"t{t}"
        anns.extend((chrom, s, e, strand, tx) for s, e in exons)
        total = sum(e - s for s, e in exons)
        for _ in range(draw(st.integers(min_value=0, max_value=4))):
            ls = draw(st.integers(min_value=0, max_value=max(total - 1, 0)))
            ll = draw(st.integers(min_value=0, max_value=total - ls))
            locs.append((tx, ls, ls + ll, draw(st.sampled_from(["+", "-"]))))
    return anns, locs


def _tx_exons_5p(anns):
    """Per-transcript exon list in 5'->3' order with local cumsum spans:
    {tx: [(chrom, gstart, gend, strand, cs, ce), ...]}."""
    by_tx: dict = {}
    for chrom, s, e, strand, tx in anns:
        by_tx.setdefault(tx, []).append((chrom, s, e, strand))
    out = {}
    for tx, exons in by_tx.items():
        neg = exons[0][3] == "-"
        ordered = sorted(exons, key=lambda x: x[1], reverse=neg)
        cs, rows = 0, []
        for chrom, gs, ge, strand in ordered:
            rows.append((chrom, gs, ge, strand, cs, cs + (ge - gs)))
            cs += ge - gs
        out[tx] = rows
    return out


def _map_global_py(anns, locs):
    """Brute-force map_to_global: clip the local interval to each exon's
    local span, lift forward/reflected, strand = '+' iff local strand ==
    exon strand (reference methods/map_to_global.py:64-67). Pair emission
    is the STRICT-OVERLAP predicate — a zero-length local interval strictly
    inside an exon's span maps to a zero-length genomic row (engine-pinned
    r8, symmetric with map_to_local's binned join)."""
    exmap = _tx_exons_5p(anns)
    out = []
    for tx, ls, le, lstrand in locs:
        for chrom, gs, ge, strand, cs, ce in exmap[tx]:
            if not (ls < ce and cs < le):
                continue
            lo, hi = max(ls, cs), min(le, ce)
            if strand == "-":
                seg = (ge - (hi - cs), ge - (lo - cs))
            else:
                seg = (gs + (lo - cs), gs + (hi - cs))
            out.append((chrom, seg[0], seg[1], "+" if lstrand == strand else "-"))
    return sorted(out)


def _map_local_py(anns, givs):
    """Brute-force map_to_local: genomic intersect per exon, then the
    reference reflection (methods/map_to_local.py:76-115: on '-' exons
    start,end = exon_end - e + cs, exon_end - s + cs). Strict-overlap
    emission: a zero-length genomic query strictly inside an exon yields a
    zero-length local row (the binned join's convention — the r8 random
    hypothesis run caught the old lo<hi oracle missing it)."""
    exmap = _tx_exons_5p(anns)
    out = []
    for chrom, s, e, qstrand in givs:
        for tx, rows in exmap.items():
            for achrom, gs, ge, astrand, cs, ce in rows:
                if achrom != chrom:
                    continue
                if not (s < ge and gs < e):
                    continue
                lo, hi = max(s, gs), min(e, ge)
                if astrand == "-":
                    seg = (ge - hi + cs, ge - lo + cs)
                else:
                    seg = (lo - gs + cs, hi - gs + cs)
                out.append(
                    (tx, seg[0], seg[1], "+" if qstrand == astrand else "-")
                )
    return sorted(out)


def _ann_gr(spark, anns):
    pdf = pd.DataFrame(
        anns, columns=["Chromosome", "Start", "End", "Strand", "tx"]
    )
    return GenomicRanges(spark.createDataFrame(pdf))


def _loc_gr(spark, locs):
    pdf = pd.DataFrame(locs, columns=["Chromosome", "Start", "End", "Strand"])
    if pdf.empty:
        return GenomicRanges(spark.createDataFrame(
            [], "Chromosome string, Start long, End long, Strand string"))
    return GenomicRanges(spark.createDataFrame(pdf))


@_SETTINGS
@given(world=_tx_world())
def test_map_to_global_matches_bruteforce(spark, world):
    anns, locs = world
    got = _loc_gr(spark, [(t, s, e, ss) for t, s, e, ss in locs]).map_to_global(
        _ann_gr(spark, anns), "tx"
    )
    rows = got.df.select("Chromosome", "Start", "End", "Strand").toPandas()
    assert sorted(map(tuple, rows.values)) == _map_global_py(anns, locs)


@_SETTINGS
@given(world=_tx_world(), givs=_frame)
def test_map_to_local_matches_bruteforce(spark, world, givs):
    anns, _ = world
    q = [(c, s, s + ln, ss) for (c, s, ln, ss, _) in givs]
    got = _loc_gr(spark, q).map_to_local(_ann_gr(spark, anns), "tx")
    rows = got.df.select("Chromosome", "Start", "End", "Strand").toPandas()
    assert sorted(map(tuple, rows.values)) == _map_local_py(anns, q)


@_SETTINGS
@given(world=_tx_world())
def test_map_global_local_roundtrip_coverage(spark, world):
    """global->local round-trip identity: lifting local intervals onto the
    genome and mapping back must preserve each transcript's covered-local-
    position multiset exactly (splits at exon boundaries are allowed; loss,
    duplication, or off-by-one reflection is not). Transcript territories
    are genomically disjoint by construction, so the inverse is unique."""
    from collections import Counter

    anns, locs = world
    ann = _ann_gr(spark, anns)
    g = _loc_gr(spark, [(t, s, e, ss) for t, s, e, ss in locs]).map_to_global(ann, "tx")
    back = g.map_to_local(ann, "tx")
    want: Counter = Counter()
    for tx, ls, le, _ in locs:
        for p in range(ls, le):
            want[(tx, p)] += 1
    got: Counter = Counter()
    for tx, s, e in map(tuple, back.df.select("Chromosome", "Start", "End").toPandas().values):
        for p in range(s, e):
            got[(tx, p)] += 1
    assert got == want


@_SETTINGS
@given(rows=_frame, drop_zero=st.booleans())
def test_to_coverage_matches_bruteforce(spark, rows, drop_zero):
    """Exact structural oracle, engine-pinned by hypothesis shrinks: the
    sweep emits one run per consecutive pair of DISTINCT interval
    endpoints (zero-length and bookend endpoints included — their net
    delta is 0 but they remain sweep points, so equal-valued neighbors
    are legal), each carrying the depth of its span; drop_zero then
    filters depth-0 runs. The oracle-gated DuckDB twin shares this
    formulation."""
    gr = _to_gr(spark, rows)
    out = gr.to_coverage(use_strand=False, drop_zero=drop_zero).df
    got = sorted(
        map(tuple, out.select("Chromosome", "Start", "End", "Value").toPandas().values)
    )
    ivs = [(c, s, s + ln) for (c, s, ln, _, _) in rows]

    def depth(c, p):
        return sum(1 for cc, s, e in ivs if cc == c and s <= p < e)

    want = []
    for c in sorted({c for c, _, _ in ivs}):
        pts = sorted({p for cc, s, e in ivs if cc == c for p in (s, e)})
        for p1, p2 in zip(pts, pts[1:]):
            v = depth(c, p1)
            if not drop_zero or v != 0:
                want.append((c, p1, p2, v))
    assert got == sorted(want)


@_SETTINGS
@given(world=st.data())
def test_calculate_frame_matches_bruteforce(spark, world):
    """Frame = (sum of 5'-preceding exon lengths) mod 3 per transcript,
    walking Start-asc on '+' and Start-desc on '-' (reference
    ext/orfs.py:42-129). Exons per transcript are disjoint with unique
    Starts so the tiebreak never decides."""
    n_tx = world.draw(st.integers(min_value=1, max_value=3))
    rows = []
    for t in range(n_tx):
        strand = world.draw(st.sampled_from(["+", "-"]))
        pos = 0
        for _ in range(world.draw(st.integers(min_value=1, max_value=5))):
            pos += world.draw(st.integers(min_value=1, max_value=4))
            ln = world.draw(st.integers(min_value=1, max_value=7))
            rows.append(("chr1", pos, pos + ln, strand, f"t{t}"))
            pos += ln
    pdf = pd.DataFrame(rows, columns=["Chromosome", "Start", "End", "Strand", "tx"])
    gr = GenomicRanges(spark.createDataFrame(pdf))
    out = gr.calculate_frame(group_by="tx").df.select("tx", "Start", "Frame").toPandas()
    got = {(r.tx, r.Start): r.Frame for r in out.itertuples()}
    by_tx: dict = {}
    for c, s, e, strand, tx in rows:
        by_tx.setdefault(tx, []).append((s, e, strand))
    want = {}
    for tx, exons in by_tx.items():
        neg = exons[0][2] == "-"
        ordered = sorted(exons, key=lambda x: x[0], reverse=neg)
        cum = 0
        for s, e, _ in ordered:
            want[(tx, s)] = cum % 3
            cum += e - s
    assert got == want
