"""Bucketed-table co-located joins — pre-shuffling data at write time.

The heaviest recurring cost in a fact⋈fact pipeline (q_join_smj's
lineitem⋈orders shape) is re-shuffling both sides on the join key for every
query. Bucketing pays that shuffle ONCE at write: ``bucketBy(n, key)``
hash-partitions files on disk, and any later equi-join (or aggregation) on
the key reads co-located buckets with **zero exchange** on either side —
at 100 TB this is the difference between a per-query multi-TB shuffle and
none.

The reference has no analog (single in-memory process); this is the Spark
layout discipline the engine's chunk tables follow at scale
(``partitionBy(library_id)`` for pruning + ``bucketBy(chunk_id)`` for
co-located hydration joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, *more_keys: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on the key
    column(s) — composite keys (e.g. the LSH index's ``(band, bh)``) bucket
    on the tuple hash, so equi-joins on the full key read the stored side
    with zero exchange."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key, *more_keys)
        .sortBy(key, *more_keys)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
