"""Streaming curation-at-ingest — the full intake gate of a training-data
pipeline run continuously: each micro-batch of raw documents is

1. quality-scored and filtered (``functions.text.quality_score``),
2. PII-scrubbed (``operators.curation.pii_scrub``),
3. deduped against the ACCUMULATED corpus LSH index
   (``operators.dedup.incremental_minhash_pairs`` — work ∝ batch, the
   corpus index is a parquet read, never re-derived),

then appended to the curated corpus; every rejected row lands in a
dead-letter table with its reason (``low_quality`` / ``near_duplicate``),
mirroring the batch ingest path's dead-letter contract
(``sources/ingest.py``).

Dedup semantics are FIRST-ARRIVAL-WINS: a batch doc is dropped when it
near-duplicates an already-indexed doc or a smaller-id doc in its own
batch. With arrival-ordered ids (the ingest-sequence case) this equals
the one-shot batch twin — quality filter → ``minhash_lsh_pairs`` → drop
every pair's ``id_b`` — which is how the parity test pins it.

Extension module — the reference has no streaming surface (SURVEY.md
§2.9); this composes the tested batch operators inside ``foreachBatch``
exactly like ``streaming/dedup.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from stackai_vector_db_spark.operators.curation import pii_scrub
from stackai_vector_db_spark.operators.dedup import (
    build_minhash_index,
    incremental_minhash_pairs,
)
from stackai_vector_db_spark.streaming.dedup import (
    _BANDED_SCHEMA,
    _BASE_SCHEMA,
    _read_or_empty,
)


def curation_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    out_dir: str,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.5,
    quality_keep: float = 0.5,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``docs_dir`` (parquet files of (doc_id, text)) as a stream;
    append curated rows to ``out_dir``/docs and rejects (with reasons) to
    ``out_dir``/rejects. ``availableNow`` trigger → terminates when the
    current input is drained; state (LSH index + outputs) lives in
    parquet, so the stream is restartable and the curated corpus is
    queryable between triggers."""
    from stackai_vector_db_spark.functions.text import quality_score

    base_path = os.path.join(index_dir, "base")
    banded_path = os.path.join(index_dir, "banded")
    docs_path = os.path.join(out_dir, "docs")
    rejects_path = os.path.join(out_dir, "rejects")

    def handle_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        scored = batch_df.withColumn(
            "score", F.round(quality_score(F.col("text")), 6)
        )
        low = scored.filter(F.col("score") < quality_keep)
        low.select(
            "doc_id", "text", F.lit("low_quality").alias("reason")
        ).write.mode("append").parquet(rejects_path)

        kept = pii_scrub(scored.filter(F.col("score") >= quality_keep))
        # Dedup runs on the scrubbed body: the canonical text the corpus
        # stores is also the text that defines near-duplication.
        dedup_in = kept.select("doc_id", F.col("clean_text").alias("text"))
        old_base = _read_or_empty(sp, base_path, _BASE_SCHEMA)
        old_banded = _read_or_empty(sp, banded_path, _BANDED_SCHEMA)
        new_base, new_banded = build_minhash_index(
            dedup_in, k=k, n_hashes=n_hashes, n_bands=n_bands
        )
        pairs = incremental_minhash_pairs(
            dedup_in,
            old_base,
            old_banded,
            k=k,
            n_hashes=n_hashes,
            n_bands=n_bands,
            jaccard_threshold=jaccard_threshold,
            new_index=(new_base, new_banded),
        )
        # First-arrival-wins: every pair's id_b is the newer side (old ids
        # precede batch ids; within a batch id_b > id_a), so id_b is the
        # duplicate to drop.
        victims = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        kept.join(victims, "doc_id", "left_semi").select(
            "doc_id", "text", F.lit("near_duplicate").alias("reason")
        ).write.mode("append").parquet(rejects_path)
        kept.join(victims, "doc_id", "left_anti").select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "score",
            "n_emails",
            "n_phones",
        ).write.mode("append").parquet(docs_path)
        # Fold the whole quality-passing batch into the index (victims
        # included: they are already represented, appending them is what
        # keeps pair emission exactly-once across batches).
        new_base.write.mode("append").parquet(base_path)
        new_banded.write.mode("append").parquet(banded_path)

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)
    q = stream.writeStream.foreachBatch(handle_batch).trigger(availableNow=True).start()
    q.awaitTermination()
