"""Banded range join — point-in-interval joins without the cross join.

No reference counterpart (north-star extension); oracle-checked by
q_range_join against the naive inequality join in DuckDB.

Spark plans a non-equi predicate like ``b.lo <= x AND x < b.hi`` as a
broadcast-nested-loop (or cartesian) join: every point is tested against
every interval — O(N·M), the classic range-join trap.

The band trick makes it an equi-join: pick a bucket width ``w``; each
interval explodes into the buckets it covers (``floor(lo/w) ..
floor((hi-ε)/w)``), each point hashes to ``floor(x/w)``; join on the bucket
key, then refine with the exact predicate. Cost: |intervals| grows by the
average intervals-per-bucket cover factor, the join is a hash join, and
each point only meets intervals sharing its bucket — O(N + M·cover +
matches). This is the standard interval-bin optimization used by warehouse
range-join implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``lo <= point < hi`` via bucket equi-join + exact refine."""
    w = float(bucket_width)
    lo_bucket = F.floor(F.col(lo_col) / w).cast("long")
    # hi is exclusive: when hi sits exactly on a bucket boundary the last
    # covered bucket is the previous one; otherwise floor(hi/w). An
    # epsilon-subtraction here is WRONG — an interval whose tail inside its
    # last bucket is smaller than the epsilon loses that bucket entirely
    # (caught by hypothesis with hi ≈ 1.2e-38). Exact boundary test only
    # ever errs toward including a harmless extra bucket that the refine
    # filter discards.
    hi_over_w = F.col(hi_col) / w
    hi_bucket = F.when(
        F.floor(hi_over_w) * w == F.col(hi_col),
        F.floor(hi_over_w).cast("long") - 1,
    ).otherwise(F.floor(hi_over_w).cast("long"))
    # greatest(): an empty interval (lo == hi) must not explode a
    # descending sequence into spurious buckets.
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(lo_bucket, F.greatest(hi_bucket, lo_bucket))),
    )
    bucketed = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("long")
    )
    return (
        bucketed.join(F.broadcast(exploded), "__bucket", how)
        .filter(
            (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )
