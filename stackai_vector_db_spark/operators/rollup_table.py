"""Hypertable-style continuous aggregate: rollup table + raw tail merge.

No reference counterpart (north-star extension). The nearest reference
analog is the dirty-counter + lazy-rebuild policy
(app/services/index_service.py:88-97) — both are
recompute-only-what-changed disciplines; here applied to time buckets.

The TimescaleDB/warehouse pattern for time-series aggregation at scale:
instead of re-scanning all history per query, maintain a materialized
per-bucket rollup up to a high-water mark, and answer queries as

    rollup(history ≤ HWM)  ∪  aggregate(raw > HWM)

re-aggregated. Refresh advances the HWM by aggregating only the new tail —
incremental cost ∝ new data, not history. At 100 TB the rollup table is
orders of magnitude smaller than the raw events and the tail is one
partition-pruned scan (events written ``partitionBy(date)`` make the
``ts > HWM`` filter a file skip).

Counts and sums re-aggregate losslessly (algebraic); avg derives from
sum/count at read time — the standard decomposable-aggregate discipline.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET = "1 hour"


class EventRollup:
    """Per-(bucket, event_type) counts/sums over an events table, refreshed
    incrementally behind an atomically-swapped high-water-mark pointer."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _hwm_path(self) -> str:
        return os.path.join(self.root, "HWM")

    def hwm_ms(self) -> int:
        try:
            with open(self._hwm_path()) as f:
                return json.load(f)["hwm_ms"]
        except FileNotFoundError:
            return 0

    def _swap_hwm(self, hwm_ms: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            json.dump({"hwm_ms": hwm_ms}, f)
        os.replace(tmp, self._hwm_path())

    def _table_path(self) -> str:
        return os.path.join(self.root, "rollup")

    @staticmethod
    def _aggregate(events: DataFrame) -> DataFrame:
        return (
            events.groupBy(F.window("ts", BUCKET).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
            .select(
                F.unix_millis(F.col("w.start")).alias("bucket_ms"),
                "event_type",
                "n",
                "sum_value",
            )
        )

    def refresh(self, events: DataFrame) -> int:
        """Aggregate only rows after the HWM, merge into the rollup table,
        advance the HWM to the last COMPLETE bucket boundary (an in-flight
        bucket stays in the raw tail until it closes)."""
        hwm = self.hwm_ms()
        tail = events.filter(F.unix_millis("ts") >= hwm)
        max_ms = tail.agg(F.max(F.unix_millis("ts"))).collect()[0][0]
        if max_ms is None:
            return hwm
        bucket_ms = 3_600_000
        new_hwm = (max_ms // bucket_ms) * bucket_ms  # last complete boundary
        closed = tail.filter(F.unix_millis("ts") < new_hwm)
        addition = self._aggregate(closed)
        if os.path.exists(self._table_path()):
            prev = self.spark.read.parquet(self._table_path())
            merged = (
                prev.unionByName(addition)
                .groupBy("bucket_ms", "event_type")
                .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
            )
        else:
            merged = addition
        tmp = self._table_path() + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
            self._table_path()
        )
        self._swap_hwm(new_hwm)
        return new_hwm

    def query(self, events: DataFrame) -> DataFrame:
        """Continuous-aggregate read: rollup history + aggregated raw tail,
        re-aggregated (buckets can span the seam only if refresh lagged;
        the groupBy makes the merge correct regardless)."""
        hwm = self.hwm_ms()
        parts = [self._aggregate(events.filter(F.unix_millis("ts") >= hwm))]
        if os.path.exists(self._table_path()):
            parts.append(self.spark.read.parquet(self._table_path()))
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        return (
            merged.groupBy("bucket_ms", "event_type")
            .agg(F.sum("n").alias("n"), F.round(F.sum("sum_value"), 6).alias("sum_value"))
        )
