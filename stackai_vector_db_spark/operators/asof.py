"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

No reference counterpart (the reference has no joins beyond the hard-coded
shapes in SURVEY.md §2.3) — this is a north-star extension; correctness is
anchored to DuckDB's native ASOF JOIN via q_asof_join's oracle.

``asof_join_backward(left, right, key, ts)`` matches every left row to the
most recent right row with ``right.ts <= left.ts`` for the same key (the
time-series/point-in-time lookup: trades→quotes, events→latest snapshot).

Scale path: NOT a per-row lookup or a range cross join. Both sides are
union-tagged and sorted once per key; a ``last(..., ignorenulls)`` running
window carries the latest right-side payload forward onto each left row.
Cost = one shuffle on the key + one per-partition sort — O(n log n), no
N×M pair blowup, works at any key cardinality. Equal timestamps match
(right row sorts before the left row at the same ts).

Determinism: right rows are deduplicated to one per (key, ts) keeping the
highest id — the same tie rule the DuckDB ASOF JOIN oracle applies after
identical pre-deduplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    right_id: str,
) -> DataFrame:
    """Left rows + (``right_id``, payload) of the as-of match, null when no
    right row precedes. ``right`` is deduped to one row per (key, ts) by
    max ``right_id`` first."""
    dedup_w = Window.partitionBy(key, ts).orderBy(F.col(right_id).desc())
    r = (
        right.withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__r_id"),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
    )
    tagged_r = r.select(
        *[
            F.col(key) if c == key else F.col(ts) if c == ts else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        F.col(right_id).cast("long").alias("__r_id"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    both = tagged_l.unionByName(tagged_r)

    # Right rows sort before left rows at the same timestamp → <= semantics.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *[F.col(c) for c in lcols],
        F.col("__is_left"),
        F.last("__r_id", ignorenulls=True).over(w).alias("matched_id"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"matched_{c}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")
