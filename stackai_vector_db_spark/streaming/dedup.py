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

Extension module — the reference has no streaming surface (SURVEY.md §2.9);
its nearest analog is the incremental ``add_vector`` path
(``app/indexes/ivf.py:168-196``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from stackai_vector_db_spark.operators.dedup import (
    build_minhash_index,
    incremental_minhash_pairs,
)

_BASE_SCHEMA = "doc_id long, shingle_set array<bigint>"
_BANDED_SCHEMA = "doc_id long, band int, bh bigint"
_PAIRS_SCHEMA = "id_a long, id_b long, jaccard double"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    if os.path.isdir(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


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
) -> None:
    """Drain ``docs_dir`` (parquet files of (doc_id, text)) as a stream,
    deduping each micro-batch against the accumulated index under
    ``index_dir`` and appending found pairs to ``pairs_dir``.

    ``availableNow`` trigger → terminates when current input is consumed;
    a production deployment drops the trigger and runs forever. State
    (index + pairs) lives in parquet, so the stream is restartable and the
    index is queryable by any batch job between triggers.
    """
    base_path = os.path.join(index_dir, "base")
    banded_path = os.path.join(index_dir, "banded")

    def handle_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        old_base = _read_or_empty(sp, base_path, _BASE_SCHEMA)
        old_banded = _read_or_empty(sp, banded_path, _BANDED_SCHEMA)
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
        )
        pairs.write.mode("append").parquet(pairs_dir)
        # The operator persisted+filled these; the appends below read the
        # cache, not the raw batch again.
        new_base.write.mode("append").parquet(base_path)
        new_banded.write.mode("append").parquet(banded_path)

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)
    q = stream.writeStream.foreachBatch(handle_batch).trigger(availableNow=True).start()
    q.awaitTermination()
