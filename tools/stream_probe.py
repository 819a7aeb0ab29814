"""Streaming-ingest throughput probe: drive ``dedup_ingest_stream`` (or
``curation_ingest_stream`` with mode=curation) over N synthetic document
batches and report per-batch wall time + sustained docs/s. The property
that matters at scale: per-batch cost tracks the BATCH size, not the
accumulated corpus (the stored index is a parquet read, never
re-derived), so batch times should stay ~flat as the index grows. Every
count reported (pairs; curated/reject-reason tallies) is a pure function
of the deterministic corpus, so runs under different topologies
(local[32] vs SPARK_GRAFT_MASTER=local-cluster[...]) must match EXACTLY
— the cross-topology parity claim of artifacts/stream_probe_lc_*.json.
Prints one JSON line.

Usage: python tools/stream_probe.py [n_batches] [docs_per_batch] [mode]
  mode: dedup (default) | curation
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stackai_vector_db_spark.session import get_spark  # noqa: E402
from stackai_vector_db_spark.streaming.dedup import (  # noqa: E402
    dedup_ingest_stream,
    read_pairs,
)


def synth_docs(spark, lo: int, hi: int, dup_every: int = 20):
    """Deterministic synthetic docs: ~15 pseudo-random words each; every
    ``dup_every``-th doc is a near-copy of an earlier one (suffix added),
    so cross-batch pairs exist."""
    src = F.when(
        F.col("id") % dup_every == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    base = spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(14)),
                lambda i: F.concat(
                    F.lit("w"),
                    # murmur3 mix of (src, i) — a linear congruential stream
                    # here produces shifted-stream collisions (id gaps where
                    # doc2's words are doc1's shifted by d), i.e. fake
                    # near-dups; proper mixing keeps unrelated docs unrelated
                    F.pmod(F.hash(F.concat_ws("-", src, i)), F.lit(100003)).cast(
                        "string"
                    ),
                ),
            ),
        ).alias("text"),
    )
    # every dup_every-th doc copies its predecessor's word stream + a tail
    # suffix → ~1/dup_every of docs are near-dups, the rest unique.
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % dup_every == 1, F.concat(F.col("text"), F.lit(" tail"))
        ).otherwise(F.col("text")),
    )


def synth_curation_docs(spark, lo: int, hi: int, dup_every: int = 20):
    """Curation-shaped synthetic docs: the dedup corpus plus (a) three
    leading stopwords so ordinary docs clear the 0.5 quality bar, (b)
    every 7th doc stripped to a 3-word fragment (fails quality), (c)
    every 11th doc carrying an email (exercises the PII scrub — and the
    redaction happens BEFORE dedup, so pair counts prove the scrubbed
    text is what defines near-duplication)."""
    base = synth_docs(spark, lo, hi, dup_every)
    txt = F.concat(F.lit("the and of "), F.col("text"))
    txt = F.when(
        F.col("doc_id") % 7 == 3, F.lit("too short fragment")
    ).otherwise(txt)
    txt = F.when(
        F.col("doc_id") % 11 == 5,
        F.concat(txt, F.lit(" contact bob@example.com now")),
    ).otherwise(txt)
    return base.withColumn("text", txt)


def run_curation(spark, root: str, docs_dir: str, n_batches: int,
                 per_batch: int) -> dict:
    """Drive curation_ingest_stream (quality → PII → dedup-vs-index) over
    the growing input; report per-batch walls + exact outcome counts."""
    from stackai_vector_db_spark.streaming.curation import (
        curation_ingest_stream,
    )

    batch_times = []
    for b in range(n_batches):
        synth_curation_docs(
            spark, b * per_batch, (b + 1) * per_batch
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        t0 = time.perf_counter()
        curation_ingest_stream(
            spark,
            docs_dir,
            os.path.join(root, "index"),
            os.path.join(root, "out"),
            max_files_per_trigger=None,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        batch_times.append(round(time.perf_counter() - t0, 3))
    curated = spark.read.parquet(os.path.join(root, "out", "docs"))
    rejects = spark.read.parquet(os.path.join(root, "out", "rejects"))
    reasons = {
        r["reason"]: r["n"]
        for r in rejects.groupBy("reason").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    return {
        "metric": "stream_curation_ingest",
        "docs_per_batch": per_batch,
        "n_batches": n_batches,
        "batch_sec": batch_times,
        "docs_per_sec": round(n_batches * per_batch / sum(batch_times), 1),
        "curated": curated.count(),
        "scrubbed": curated.filter(
            F.col("n_emails") + F.col("n_phones") > 0
        ).count(),
        "rejects": reasons,
    }


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    mode = sys.argv[3] if len(sys.argv) > 3 else "dedup"

    spark = get_spark(app_name="stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_probe_")
    docs_dir = os.path.join(root, "docs")
    if mode == "curation":
        try:
            print(json.dumps(run_curation(
                spark, root, docs_dir, n_batches, per_batch
            )))
        finally:
            shutil.rmtree(root, ignore_errors=True)
            spark.stop()
        return
    try:
        batch_times = []
        total_docs = 0
        for b in range(n_batches):
            synth_docs(spark, b * per_batch, (b + 1) * per_batch).coalesce(
                1
            ).write.mode("append").parquet(docs_dir)
            t0 = time.perf_counter()
            # The shared checkpoint makes each invocation drain only the
            # NEW file and keeps batch_id monotonic across invocations —
            # one probe iteration = one micro-batch against the
            # accumulated index.
            dedup_ingest_stream(
                spark,
                docs_dir,
                os.path.join(root, "index"),
                os.path.join(root, "pairs"),
                max_files_per_trigger=None,
                checkpoint_dir=os.path.join(root, "ckpt"),
            )
            batch_times.append(round(time.perf_counter() - t0, 3))
            total_docs += per_batch
        n_pairs = read_pairs(spark, os.path.join(root, "pairs")).count()
        print(
            json.dumps(
                {
                    "metric": "stream_dedup_ingest",
                    "docs_per_batch": per_batch,
                    "n_batches": n_batches,
                    "batch_sec": batch_times,
                    "docs_per_sec": round(total_docs / sum(batch_times), 1),
                    "pairs_found": n_pairs,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
