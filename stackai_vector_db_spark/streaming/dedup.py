"""Streaming incremental dedup — dedup-at-ingest for a continuously
arriving corpus.

Each micro-batch of documents is deduped against the ACCUMULATED corpus
LSH index (``operators.dedup.incremental_minhash_pairs``) inside a
``foreachBatch`` handler, then folded into the index: near-dup pairs are
appended to a pairs table and the batch's shingle/band tables are appended
to the stored index. Work per batch scales with the batch (the corpus
index is a bucketed parquet read, never re-derived) — the streaming twin
of the daily-increment batch path, and the shape a 100 TB crawl-ingest
pipeline runs continuously.

Exactness: batches partition the corpus, and a pair (a, b) is emitted
exactly once — by the batch that completes it — so the union of per-batch
pairs equals the one-shot ``minhash_lsh_pairs`` over the whole corpus
regardless of arrival order (tested in tests/test_streaming.py).

At-least-once safety: ``foreachBatch`` may replay an epoch after a
mid-batch failure, so every write carries the epoch's ``batch_id`` as a
partition column with dynamic-partition OVERWRITE (a replay rewrites its
own partitions, never appends duplicates), and index reads filter to
``batch_id < current`` so a half-written epoch never band-joins a batch
against its own shingles (which would emit every within-batch pair twice
and self-pairs besides).

Extension module — the reference has no streaming surface (SURVEY.md §2.9);
its nearest analog is the incremental ``add_vector`` path
(``app/indexes/ivf.py:168-196``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from stackai_vector_db_spark.catalog import layout_partitions
from stackai_vector_db_spark.operators.dedup import (
    build_minhash_index,
    incremental_minhash_pairs,
)

# Per-row width estimates for the epoch-write layout (catalog
# .layout_partitions): base carries (doc_id, shingle_set ~word-count
# bigints) ≈ 400 B/doc at fixture word counts; banded carries n_bands
# small rows/doc ≈ 24 B each.
_BASE_ROW_BYTES = 400
_BANDED_ROW_BYTES = 24

_BASE_SCHEMA = "doc_id long, shingle_set array<bigint>, batch_id long"
_BANDED_SCHEMA = "doc_id long, band int, bh bigint, batch_id long"
_PAIRS_SCHEMA = "id_a long, id_b long, jaccard double, batch_id long"


def _read_or_empty(
    spark: SparkSession, path: str, schema: str, before: int | None = None
) -> DataFrame:
    """Read an epoch-partitioned state table WITHOUT the batch_id column;
    ``before`` filters to epochs strictly earlier than the given batch_id,
    ``None`` means every epoch. Handles two legacy/edge layouts: rows
    written by the pre-epoch append-based code have no batch_id (reads as
    null → treated as epoch -1, i.e. always earlier — never silently
    dropped), and a path that does not exist yet yields an empty frame of
    the data columns."""
    data_cols = ", ".join(
        c for c in schema.split(", ") if not c.startswith("batch_id")
    )
    if not os.path.isdir(path):
        return spark.createDataFrame([], data_cols)
    entries = os.listdir(path)
    root_files = [
        f for f in entries if f.startswith("part-") and f.endswith(".parquet")
    ]
    has_epochs = any(f.startswith("batch_id=") for f in entries)
    if not has_epochs:
        # Pure pre-epoch layout (or empty dir): batch_id is absent from the
        # files, reads as null → epoch -1, always earlier than any `before`.
        df = spark.read.schema(schema).parquet(path)
        if before is not None:
            df = df.filter(F.coalesce(F.col("batch_id"), F.lit(-1)) < before)
        return df.drop("batch_id")
    df = spark.read.schema(schema).parquet(path)
    if before is not None:
        df = df.filter(F.col("batch_id") < before)
    df = df.drop("batch_id")
    if root_files:
        # MIXED layout: a pre-epoch dir that has since received epoch
        # writes. Spark's partition discovery over batch_id=*/ silently
        # ignores the unpartitioned root files, which would forget the
        # whole legacy index (round-4 advisor finding) — read the root
        # files explicitly as epoch -1 and union. Epoch -1 is earlier than
        # every real epoch, so no `before` filter applies to it.
        legacy = spark.read.schema(data_cols).parquet(
            *[os.path.join(path, f) for f in root_files]
        )
        df = df.unionByName(legacy)
    return df


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Schema-aware read of the pairs table: safe when the directory is
    missing or holds only empty epochs (a corpus with no near-dups writes
    zero data files, which plain ``spark.read.parquet`` cannot infer)."""
    return _read_or_empty(spark, pairs_dir, _PAIRS_SCHEMA)


def _overwrite_epoch(df: DataFrame, bid: int, path: str) -> None:
    """Idempotent epoch write: partition by batch_id, overwrite only this
    epoch's partition — a foreachBatch replay rewrites, never duplicates."""
    (
        df.withColumn("batch_id", F.lit(bid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def dedup_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    pairs_dir: str,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``docs_dir`` (parquet files of (doc_id, text)) as a stream,
    deduping each micro-batch against the accumulated index under
    ``index_dir`` and appending found pairs to ``pairs_dir``.

    ``availableNow`` trigger → terminates when current input is consumed;
    a production deployment drops the trigger and runs forever. State
    (index + pairs) lives in parquet, so the stream is restartable and the
    index is queryable by any batch job between triggers.

    Pass ``checkpoint_dir`` when the stream will be INVOKED repeatedly
    over a growing input directory: the offset log then skips already-
    consumed files and keeps batch_id monotonic across invocations (the
    epoch-partitioned writes depend on distinct content getting distinct
    batch ids). Without a checkpoint, a re-invocation re-processes
    everything with batch ids restarting at 0 — byte-identical replay,
    which the epoch overwrite makes idempotent, but ONLY if the replay
    keeps the same trigger settings/file layout: a replay that groups the
    files into fewer batches rewrites only the low epochs and leaves the
    original run's higher epochs stale beside them. New files must arrive
    alongside the old ones, never replace them.
    """
    base_path = os.path.join(index_dir, "base")
    banded_path = os.path.join(index_dir, "banded")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        old_base = _read_or_empty(sp, base_path, _BASE_SCHEMA, before=batch_id)
        old_banded = _read_or_empty(
            sp, banded_path, _BANDED_SCHEMA, before=batch_id
        )
        new_base, new_banded = build_minhash_index(
            batch_df, k=k, n_hashes=n_hashes, n_bands=n_bands
        )
        pairs = incremental_minhash_pairs(
            batch_df,
            old_base,
            old_banded,
            k=k,
            n_hashes=n_hashes,
            n_bands=n_bands,
            jaccard_threshold=jaccard_threshold,
            new_index=(new_base, new_banded),
        ).filter(F.col("id_a") != F.col("id_b"))
        _overwrite_epoch(pairs, batch_id, pairs_dir)
        # The operator persisted+filled these; the writes below read the
        # cache, not the raw batch again. Epoch files are sized by VOLUME
        # (r12, guide §6): the build's shuffle parallelism would otherwise
        # emit ~cores near-empty part files per epoch into a state table
        # that accumulates forever — thousands of epochs of tiny files is
        # exactly the small-files listing/open tax the stored-index read
        # side pays on every later batch. coalesce (not repartition) —
        # it only narrows the cache→write stage, the computation is
        # already cached; the count is a cache-hit job. The pairs write
        # keeps its AQE-coalesced layout (its plan ends at an exchange,
        # which AQE already sizes; a coalesce would propagate up and
        # serialize the band join itself).
        n_new = new_base.count()
        _overwrite_epoch(
            new_base.coalesce(layout_partitions(n_new, _BASE_ROW_BYTES)),
            batch_id, base_path,
        )
        _overwrite_epoch(
            new_banded.coalesce(
                layout_partitions(n_new * n_bands, _BANDED_ROW_BYTES)
            ),
            batch_id, banded_path,
        )

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)
    writer = stream.writeStream.foreachBatch(handle_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
