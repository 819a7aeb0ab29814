"""Property-based tests for the custom join operators: as-of and banded
range join vs brute-force Python oracles on randomized inputs — ties,
negatives, empties, and bucket-boundary values included."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st

from pyspark.sql import functions as F

from stackai_vector_db_spark.operators.asof import asof_join_backward
from stackai_vector_db_spark.operators.range_join import banded_range_join

ts_val = st.integers(min_value=0, max_value=30)
key_val = st.integers(min_value=0, max_value=2)

left_rows = st.lists(
    st.tuples(key_val, ts_val), min_size=1, max_size=12
)
right_rows = st.lists(
    st.tuples(key_val, ts_val), min_size=0, max_size=12
)


def _py_asof(left, right):
    """Oracle: per left row, the right row with max ts <= left.ts for the
    key; among equal ts, the max right id (mirrors the dedup rule)."""
    out = {}
    for li, (lk, lt) in enumerate(left):
        best = None
        for ri, (rk, rt) in enumerate(right):
            if rk == lk and rt <= lt:
                if best is None or (rt, ri) > (right[best][1], best):
                    best = ri
        out[li] = best
    return out


@settings(max_examples=10, deadline=None)
@given(left_rows, right_rows)
def test_asof_matches_python_oracle(spark, left, right):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left)],
        "lid long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(right)],
        "event_id long, user_id long, ts timestamp",
    ) if right else spark.createDataFrame([], "event_id long, user_id long, ts timestamp")

    got = {
        r.lid: r.matched_id
        for r in asof_join_backward(
            ldf, rdf, key="user_id", ts="ts",
            right_payload=["ts"], right_id="event_id",
        ).collect()
    }
    want = _py_asof(left, right)
    assert got == {li: (ri if ri is not None else None) for li, ri in want.items()}


pt = st.floats(min_value=-50, max_value=50, allow_nan=False, width=32)
interval = st.tuples(pt, pt).map(lambda ab: (min(ab), max(ab)))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(pt, min_size=1, max_size=30),
    st.lists(interval, min_size=1, max_size=6),
    st.sampled_from([1.0, 3.7, 8.0]),
)
# regression: an interval whose tail inside its last bucket is below the
# old epsilon (1e-9) lost that bucket — found by hypothesis, fixed with
# exact boundary arithmetic in banded_range_join
@example([0.0], [(-1.0, 1.1754943508222875e-38)], 1.0)
def test_banded_range_join_matches_naive(spark, points, intervals, width):
    pdf = spark.createDataFrame([(float(x),) for x in points], "x double")
    idf = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(intervals)],
        "band_id int, lo double, hi double",
    )
    got = sorted(
        (r.band_id, r.x)
        for r in banded_range_join(pdf, idf, "x", "lo", "hi", bucket_width=width).collect()
    )
    want = sorted(
        (i, float(x))
        for x in points
        for i, (lo, hi) in enumerate(intervals)
        if lo <= x < hi
    )
    assert got == want
