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

Dedup semantics are FIRST-ARRIVAL-WINS regardless of id values: the
victim of every near-dup pair is the BATCH-side doc when the other side
is already indexed (ids do not decide seniority — arrival does), and the
larger id within a same-batch pair. With arrival-ordered ids (the
ingest-sequence case) this coincides with the one-shot batch twin —
quality filter → ``minhash_lsh_pairs`` → drop every pair's ``id_b`` —
which is how the parity test pins it; out-of-order ids are pinned by a
dedicated test (the newcomer is rejected even when its id is smaller).

Exactly-once under retries: ``foreachBatch`` is at-least-once, so every
write carries the epoch's ``batch_id`` as a partition column and uses
dynamic-partition OVERWRITE — a replayed epoch rewrites its own
partitions instead of appending duplicates — and index reads filter to
``batch_id < current`` so a half-written epoch never pairs a batch
against its own shingles (which would self-reject the whole batch).

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
from stackai_vector_db_spark.catalog import layout_partitions
from stackai_vector_db_spark.streaming.dedup import (
    _BANDED_ROW_BYTES,
    _BANDED_SCHEMA,
    _BASE_ROW_BYTES,
    _BASE_SCHEMA,
    _overwrite_epoch,
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
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``docs_dir`` (parquet files of (doc_id, text)) as a stream;
    append curated rows to ``out_dir``/docs and rejects (with reasons) to
    ``out_dir``/rejects. ``availableNow`` trigger → terminates when the
    current input is drained; state (LSH index + outputs) lives in
    parquet, so the stream is restartable and the curated corpus is
    queryable between triggers. Pass ``checkpoint_dir`` when invoking the
    stream repeatedly over a growing input directory (see
    ``dedup_ingest_stream`` — it keeps batch_id monotonic, which the
    epoch-partitioned writes depend on)."""
    from stackai_vector_db_spark.functions.text import quality_score

    base_path = os.path.join(index_dir, "base")
    banded_path = os.path.join(index_dir, "banded")
    docs_path = os.path.join(out_dir, "docs")
    rejects_path = os.path.join(out_dir, "rejects")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        scored = batch_df.withColumn(
            "score", F.round(quality_score(F.col("text")), 6)
        )
        # Persist: low-reject, dup-reject and curated writes are three
        # actions over the same scored/scrubbed batch — without a cache
        # the regex scoring+scrub pipeline re-runs per action.
        kept = pii_scrub(scored.filter(F.col("score") >= quality_keep)).persist()
        low_rejects = scored.filter(F.col("score") < quality_keep).select(
            "doc_id", "text", F.lit("low_quality").alias("reason")
        )

        # Dedup runs on the scrubbed body: the canonical text the corpus
        # stores is also the text that defines near-duplication.
        old_base = _read_or_empty(sp, base_path, _BASE_SCHEMA, before=batch_id)
        old_banded = _read_or_empty(
            sp, banded_path, _BANDED_SCHEMA, before=batch_id
        )
        # Within-batch doc_id collisions first: the stored-index gate
        # below can't see them (neither copy is stored yet), so both would
        # enter the corpus and the index — the same unique-doc_id breach,
        # intra-batch (availableNow drains every pending file into one
        # batch, so two files carrying one id is a normal arrival shape).
        # Keep one deterministic winner per id — min (clean_text, text),
        # because micro-batch row order is not stable across replays but
        # the text is. clean_text alone is NOT a total key: two raw texts
        # can scrub to the same clean form while scoring differently, and
        # an arbitrary winner would replay with a different score row
        # (round-5 review). Raw text breaks the tie, and every other
        # column (score, scrub counts) is derived from it.
        from pyspark.sql.window import Window as _W

        rn = F.row_number().over(
            _W.partitionBy("doc_id").orderBy("clean_text", "text")
        )
        numbered = kept.withColumn("__rn", rn)
        intra_rejects = numbered.filter(F.col("__rn") > 1).select(
            "doc_id", "text", F.lit("duplicate_doc_id").alias("reason")
        )
        uniq = numbered.filter(F.col("__rn") == 1).drop("__rn")
        # A doc_id already in the stored index is a re-ingest of itself:
        # reject it OUTRIGHT before pairing (round-4 advisor finding — the
        # id_a != id_b pair filter would otherwise re-admit it, appending
        # a duplicate doc_id to the corpus and double-counting its
        # shingles in the index). Keeps the index unique on doc_id.
        stored_ids = old_base.select("doc_id")
        reingests = uniq.join(stored_ids, "doc_id", "left_semi").select(
            "doc_id", "text", F.lit("duplicate_doc_id").alias("reason")
        )
        kept_new = uniq.join(stored_ids, "doc_id", "left_anti")
        dedup_in = kept_new.select("doc_id", F.col("clean_text").alias("text"))
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
        ).filter(F.col("id_a") != F.col("id_b"))
        # First-arrival-wins: the stored side of a pair is senior no matter
        # its id. Pairs are canonicalized id_a < id_b, so the victim is the
        # side that is IN this batch — both sides for a within-batch pair,
        # where the larger id (id_b) loses.
        batch_ids = dedup_in.select("doc_id")
        a_new = pairs.join(
            batch_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
        )
        b_new = pairs.join(
            batch_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi"
        )
        victims = (
            b_new.select(F.col("id_b").alias("doc_id"))  # b in batch: b loses
            .unionByName(
                # a in batch while b is stored: a is the newcomer, a loses
                a_new.join(
                    batch_ids.withColumnRenamed("doc_id", "id_b"),
                    "id_b",
                    "left_anti",
                ).select(F.col("id_a").alias("doc_id"))
            )
            .distinct()
            .persist()
        )
        dup_rejects = kept_new.join(victims, "doc_id", "left_semi").select(
            "doc_id", "text", F.lit("near_duplicate").alias("reason")
        )
        # ONE write per table per epoch: a second dynamic overwrite of the
        # same batch_id partition would clobber the first.
        _overwrite_epoch(
            low_rejects.unionByName(intra_rejects)
            .unionByName(reingests)
            .unionByName(dup_rejects),
            batch_id,
            rejects_path,
        )
        _overwrite_epoch(
            kept_new.join(victims, "doc_id", "left_anti").select(
                "doc_id",
                F.col("clean_text").alias("text"),
                "score",
                "n_emails",
                "n_phones",
            ),
            batch_id,
            docs_path,
        )
        # Fold the whole quality-passing batch into the index (victims
        # included: they are already represented, appending them is what
        # keeps pair emission exactly-once across batches). Epoch files
        # sized by volume, same rule and rationale as streaming/dedup.py
        # (the state table accumulates per-epoch files forever; the count
        # is a cache-hit job — incremental_minhash_pairs filled the cache).
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
        victims.unpersist()
        kept.unpersist()

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)
    writer = stream.writeStream.foreachBatch(handle_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
