"""Capture the per-batch physical plans of a streaming pipeline's epoch
writes (the foreachBatch bodies are closures, so the plans are captured by
wrapping the module-level epoch-write helper each handler calls).

Drives the curation (or dedup) ingest stream over two synthetic batches —
the SECOND batch runs against a non-empty stored index, so the dumped plans
show the real steady-state shape: the stored-index read side of the band
join, the broadcast strategy, and the volume-sized coalesce on the state
writes. One file per epoch write, named by its target table.

Usage: python tools/dump_stream_plans.py <outdir> [mode]
  mode: curation (default) | dedup
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackai_vector_db_spark.session import get_spark  # noqa: E402


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    mode = sys.argv[2] if len(sys.argv) > 2 else "curation"
    os.makedirs(outdir, exist_ok=True)

    from tools.stream_probe import synth_curation_docs, synth_docs

    from stackai_vector_db_spark.streaming import curation as cur_mod
    from stackai_vector_db_spark.streaming import dedup as dedup_mod

    spark = get_spark(app_name="dump_stream_plans")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dump_stream_")
    docs_dir = os.path.join(root, "docs")

    mod = cur_mod if mode == "curation" else dedup_mod
    synth = synth_curation_docs if mode == "curation" else synth_docs
    real_write = mod._overwrite_epoch
    captured: dict[str, str] = {}

    def capture_write(df, bid, path):
        if bid >= 1:  # steady state: the stored index is non-empty
            captured[os.path.basename(path)] = _fmt(df)
        real_write(df, bid, path)

    mod._overwrite_epoch = capture_write
    try:
        for b in range(2):
            synth(spark, b * 500, (b + 1) * 500).coalesce(1).write.mode(
                "append"
            ).parquet(docs_dir)
            kwargs = dict(
                max_files_per_trigger=None,
                checkpoint_dir=os.path.join(root, "ckpt"),
            )
            if mode == "curation":
                cur_mod.curation_ingest_stream(
                    spark, docs_dir, os.path.join(root, "index"),
                    os.path.join(root, "out"), **kwargs,
                )
            else:
                dedup_mod.dedup_ingest_stream(
                    spark, docs_dir, os.path.join(root, "index"),
                    os.path.join(root, "pairs"), **kwargs,
                )
        for table, plan in captured.items():
            path = os.path.join(outdir, f"stream_{mode}_{table}_batch.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    finally:
        mod._overwrite_epoch = real_write
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
