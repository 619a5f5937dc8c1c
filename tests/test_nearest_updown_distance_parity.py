"""r15 optimization pin: nearest_distance(direction=upstream/downstream)
computes exactly the (self rows, Distance) projection of
nearest_ranges(k=1) for the same direction.

The registry's nearest_updown gate keeps only self columns + Distance, so
it rides the distance-only plan (no right-side rank relations, no
rank-explode joins, no right-columns assembly join). This parity property is
the equivalence argument: per left row both paths minimize the same distance
over the same three candidate branches (forward leg, backward leg, overlap),
so the value and the kept-row set must be identical — including the 5'-aware
per-row leg mapping on stranded input and the single-direction degrade on
unstranded input.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.operators.nearest import nearest_distance

_interval = st.tuples(
    st.sampled_from(["chr1", "chr2"]),
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=0, max_value=25),
    st.sampled_from(["+", "-"]),
    st.integers(min_value=0, max_value=5),
)

_frame = st.lists(_interval, min_size=0, max_size=12)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _to_gr(spark, rows, with_strand=True):
    cols = ["Chromosome", "Start", "End", "Strand", "Score"]
    data = [(c, s, s + ln, st_, sc) for (c, s, ln, st_, sc) in rows]
    if not with_strand:
        cols = ["Chromosome", "Start", "End", "Score"]
        data = [(c, s, e, sc) for (c, s, e, _st, sc) in data]
    pdf = pd.DataFrame(data, columns=cols)
    if pdf.empty:
        schema = ", ".join(
            f"{c} {'string' if c in ('Chromosome', 'Strand') else 'long'}" for c in cols
        )
        df = spark.createDataFrame([], schema)
    else:
        df = spark.createDataFrame(pdf)
    return GenomicRanges(df)


def _dist_rows(df, stranded):
    # Only LEFT columns + Distance: nearest_ranges additionally appends the
    # right side's columns (un-suffixed when absent from the left frame, e.g.
    # the right Strand on an unstranded left), which the distance-only path
    # deliberately never computes.
    cols = ["Chromosome", "Start", "End", *(["Strand"] if stranded else []), "Distance"]
    return sorted(map(tuple, df.select(*cols).toPandas().values))


@_SETTINGS
@given(
    a=_frame,
    b=_frame,
    direction=st.sampled_from(["upstream", "downstream"]),
    stranded=st.booleans(),
)
def test_nearest_updown_distance_parity(spark, a, b, direction, stranded):
    ga = _to_gr(spark, a, with_strand=stranded)
    gb = _to_gr(spark, b)
    full = ga.nearest_ranges(
        gb, direction=direction, k=1, strand_behavior="ignore", dist_col="Distance"
    ).df
    fast = nearest_distance(
        ga, gb, direction=direction, strand_behavior="ignore", dist_col="Distance"
    ).df
    assert _dist_rows(fast, stranded) == _dist_rows(full, stranded)
