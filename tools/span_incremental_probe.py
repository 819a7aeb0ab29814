"""Span-dedup at probe scale via the incremental ∪-decomposition.

The direct 80M span run does not fit this sandbox: span_dup_stats keys
~n_tokens rows per doc and its corpus-wide shuffles need ~190 GB of
scratch vs the 80 GB free (artifacts/dedup_probe_r9.json). The engine
already owns the decomposition that bounds per-step scratch to one
batch (r9 judge brief #2) — this tool runs it end to end:

  Pass 1 (index build — the daily-increment shape): slice the corpus
  into K generator-sliced batches (fake_corpus `start` option: batch
  cost, not filtered-full-scan cost) and fold each into the stored span
  index with merge_span_index, persisting each version as a
  ``bucketBy(64, "__key")`` sorted table so every merge shuffles ONLY
  the batch's keys — the stored side is read in place. Old versions are
  dropped as soon as the next is committed, so peak disk is two index
  versions + one batch's shuffle, never the corpus-wide rollup.
  ``SPAN_PROBE_PARTS=P`` switches to the PARTITION-WISE form: the index
  is stored as P bucketed tables keyed by ``pmod(xxhash64(__key), P)``,
  each merged and committed separately with its old partition dropped
  immediately — peak version coexistence shrinks from a whole old
  version to ONE partition (the snapshot-expiry/compaction shape real
  table formats use), which is what fits span-160M on this sandbox.

  Pass 2 (scoring): for each batch, join its (key, id, n_occ) rollup
  against the FINAL index and flag spans with nd ≥ 2. Because the index
  counts distinct docs over the WHOLE corpus, this equals
  span_dup_stats(full corpus) restricted to the batch's ids — exactly
  (identity asserted at tiny scale in tests/test_dedup.py and at 20M
  against the recorded direct run). Per-batch shuffle is again the
  batch's keys only; the bucketed index side never moves.

  The last batch's pass-1 step doubles as the daily-increment contract
  at real scale: incremental_span_dup_stats(batch_K, index_{K-1})
  flags dup iff nd_old ≥ 1 or nd_batch ≥ 2 ⇔ nd_full ≥ 2 — the same
  verdict pass 2 computes for that batch (asserted when phases include
  "incremental").

Usage: python tools/span_incremental_probe.py <ndocs> <n_batches> \
           [phases: build,score,incremental] [period]
Env: SPAN_PROBE_DB (default span_probe), SPARK_GRAFT_MASTER/CPUS as in
session.py. Emits one JSON dict on stdout.

100 TB shape: this IS the form a production pipeline runs — a stored,
bucketed span index plus daily batches whose work scales with the
batch. K here stands in for "days"; per-batch scratch ∝ batch is the
property that makes the operator deployable regardless of corpus size.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stackai_vector_db_spark.operators.dedup import (  # noqa: E402
    _span_finalize,
    _span_rollup,
    build_span_index,
    incremental_span_dup_stats,
    merge_span_index,
)
from stackai_vector_db_spark.session import get_spark  # noqa: E402
from stackai_vector_db_spark.sources.fake_corpus import register  # noqa: E402

N_BUCKETS = 64
WINDOW = 8


def batch_df(spark, ndocs: int, n_batches: int, i: int, period: int,
             dup_per_100: int, mixer: str):
    """Batch i of the corpus: ids [i*B, min((i+1)*B, ndocs)) via the
    generator's `start` slice — byte-identical to the same id range of a
    full read, at batch cost."""
    b = -(-ndocs // n_batches)  # ceil
    lo = i * b
    n = min(b, ndocs - lo)
    par = spark.sparkContext.defaultParallelism
    return (
        spark.read.format("fake_corpus")
        .option("n", n)
        .option("start", lo)
        .option("partitions", par)
        .option("period", period)
        .option("dup_per_100", dup_per_100)
        .option("token_mixer", mixer)
        .load()
    )


def _write_index(df, table: str) -> None:
    """One file per bucket (repartition first) so the bucketed+sorted
    read needs neither shuffle nor sort on the stored side."""
    (
        df.repartition(N_BUCKETS, "__key")
        .write.bucketBy(N_BUCKETS, "__key")
        .sortBy("__key")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def _warehouse_path(spark, db: str, name: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    return os.path.join(wh, f"{db}.db", name)


def _meta_path(spark, db: str, name: str) -> str:
    return _warehouse_path(spark, db, name) + ".meta.json"


def _write_meta(spark, db: str, name: str, params: dict) -> None:
    """Sidecar recording the build params of a kept index, so a
    phase-split score run cannot silently join against an index built
    with a different ndocs/n_batches/period/mixer/window (r10 advisor:
    the rollup-join drops unindexed batch keys with no error — wrong dup
    counts, not a crash)."""
    with open(_meta_path(spark, db, name), "w") as f:
        json.dump(params, f)


def _drop_index(spark, db: str, name: str) -> None:
    """Drop the catalog entry AND the files: a re-registered index is an
    EXTERNAL table (CREATE TABLE ... LOCATION), whose DROP leaves the
    parquet behind in the warehouse (r10 advisor) — remove the directory
    and the meta sidecar explicitly so both registration paths clean up
    the same way."""
    loc = _warehouse_path(spark, db, name)
    spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
    shutil.rmtree(loc, ignore_errors=True)
    try:
        os.remove(_meta_path(spark, db, name))
    except OSError:
        pass


def _ensure_registered(spark, db: str, name: str, expect: dict) -> None:
    """Re-register a kept index table in a fresh session: saveAsTable
    metadata lives in the session's in-memory catalog and dies with it,
    but the bucketed files survive in the warehouse — recreate the
    catalog entry (same bucket spec) over them so the phase-split CLI
    works across invocations (r10 review). ALWAYS validates the meta
    sidecar against the current invocation's params — an index built
    with different ndocs/n_batches/period/mixer/window would inner-join
    away unindexed batch keys and record wrong counts silently."""
    tbl = f"{db}.{name}"
    loc = _warehouse_path(spark, db, name)
    if not spark.catalog.tableExists(tbl):
        if not os.path.isdir(loc):
            raise SystemExit(
                f"stored index {tbl} not found at {loc}; run the build "
                "phase first"
            )
        spark.sql(
            f"CREATE TABLE {tbl} (__key BINARY, nd BIGINT) USING parquet "
            f"CLUSTERED BY (__key) SORTED BY (__key) INTO {N_BUCKETS} BUCKETS "
            f"LOCATION '{loc}'"
        )
    mp = _meta_path(spark, db, name)
    if not os.path.isfile(mp):
        raise SystemExit(
            f"stored index {tbl} has no meta sidecar ({mp}); rebuild with "
            "the current tool so its build params are verifiable"
        )
    with open(mp) as f:
        stored = json.load(f)
    if stored != expect:
        raise SystemExit(
            f"stored index {tbl} was built with {stored}, but this "
            f"invocation expects {expect} — scoring against it would "
            "silently drop unindexed batch keys; rebuild or match params"
        )


def _part_expr(parts: int):
    """Deterministic key→partition assignment (xxhash64 mod parts):
    partitions are disjoint key sets, so per-partition keywise merges
    and joins compose to exactly the global ones."""
    return F.pmod(F.xxhash64("__key"), F.lit(parts)).cast("int")


def _merge_indexes(old, new):
    """Keywise full-outer sum of two (__key, nd) tables — the
    table⊕table form of merge_span_index's join (the doc-side variant
    builds the batch index inline); used by the partition-wise build,
    where the batch index is precomputed and sliced."""
    return (
        old.withColumnRenamed("nd", "__nd_old")
        .join(new.withColumnRenamed("nd", "__nd_new"), "__key", "full_outer")
        .select(
            "__key",
            (
                F.coalesce("__nd_old", F.lit(0))
                + F.coalesce("__nd_new", F.lit(0))
            ).alias("nd"),
        )
    )


def _read_part(spark, tmp_dir: str, p: int, schema: str):
    """One partition of a partitionBy("__part") temp write; a partition
    with no keys at tiny scale has no directory — empty frame then."""
    d = os.path.join(tmp_dir, f"__part={p}")
    return (spark.read.parquet(d) if os.path.isdir(d)
            else spark.createDataFrame([], schema))


def _final_names(n_batches: int, parts: int) -> list:
    v = f"idx_v{n_batches - 1}"
    return [f"{v}_p{p}" for p in range(parts)] if parts else [v]


def run(spark, ndocs: int, n_batches: int, period: int = 4_000_000_553,
        dup_per_100: int = 3, mixer: str = "hashed",
        phases: set | None = None, db: str = "span_probe",
        collect_stats: bool = False, parts: int = 0) -> dict:
    phases = phases or {"build", "score", "incremental"}
    register(spark)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    out: dict = {
        "ndocs": ndocs, "n_batches": n_batches, "period": period,
        "dup_per_100": dup_per_100, "token_mixer": mixer, "window": WINDOW,
    }

    def report(k, v):
        out[k] = v
        print(f"SPANPROBE {k}={v}", file=sys.stderr, flush=True)

    params = {
        "ndocs": ndocs, "n_batches": n_batches, "period": period,
        "dup_per_100": dup_per_100, "token_mixer": mixer, "window": WINDOW,
        "n_buckets": N_BUCKETS, "parts": parts,
    }
    inc_check: int | None = None  # incremental-vs-score cross-check value
    final_tbl = f"{db}.idx_v{n_batches - 1}"

    def final_index(ensure: bool):
        """Union of the final version's tables — for COUNTS and the
        (small-scale) incremental contract only: a union erases bucket
        metadata, so joins must go per partition table instead."""
        names = _final_names(n_batches, parts)
        if ensure:
            for n in names:
                _ensure_registered(spark, db, n, params)
        dfs = [spark.table(f"{db}.{n}") for n in names]
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d)
        return u

    if "build" in phases:
        # Pre-clean every version this build will (re)create: an
        # interrupted earlier run can leave index files in the warehouse
        # that a FRESH session's in-memory catalog knows nothing about,
        # and saveAsTable then dies with LOCATION_ALREADY_EXISTS instead
        # of overwriting. A build run owns all versions of this db's
        # index by contract, so dropping catalog entry + files + meta
        # sidecar up front makes the build idempotent.
        for i in range(n_batches):
            for name in _final_names(i + 1, parts):
                _drop_index(spark, db, name)
        shutil.rmtree(_warehouse_path(spark, db, "batch_idx_tmp"),
                      ignore_errors=True)
        t_all = time.perf_counter()
        for i in range(n_batches):
            t0 = time.perf_counter()
            batch = batch_df(spark, ndocs, n_batches, i, period,
                             dup_per_100, mixer)
            if parts:
                # Partition-wise merge — the format change that bounds
                # version-coexistence disk to ONE partition: old_p is
                # dropped the moment new_p commits, so the peak is the
                # live index + one partition + the batch's own index,
                # never two whole versions. (The single-table form's
                # 2-version peak is what put span-160M past this
                # sandbox's free disk; see README density series.)
                bdir = _warehouse_path(spark, db, "batch_idx_tmp")
                (
                    build_span_index(batch, window=WINDOW)
                    .withColumn("__part", _part_expr(parts))
                    .write.mode("overwrite").partitionBy("__part")
                    .parquet(bdir)
                )
                for p in range(parts):
                    bp = _read_part(spark, bdir, p,
                                    "`__key` binary, nd bigint")
                    if i == 0:
                        new_p = bp
                    else:
                        new_p = _merge_indexes(
                            spark.table(f"{db}.idx_v{i - 1}_p{p}"), bp
                        )
                    _write_index(new_p, f"{db}.idx_v{i}_p{p}")
                    if i > 0:
                        _drop_index(spark, db, f"idx_v{i - 1}_p{p}")
                shutil.rmtree(bdir, ignore_errors=True)
            elif i == 0:
                _write_index(build_span_index(batch, window=WINDOW),
                             f"{db}.idx_v0")
            else:
                prev = spark.table(f"{db}.idx_v{i - 1}")
                # ids are disjoint by slicing, so no known_ids gate needed
                _write_index(
                    merge_span_index(prev, batch, window=WINDOW),
                    f"{db}.idx_v{i}",
                )
                _drop_index(spark, db, f"idx_v{i - 1}")
            report(f"merge_{i}_s", round(time.perf_counter() - t0, 3))
        for name in _final_names(n_batches, parts):
            _write_meta(spark, db, name, params)
        report("build_total_s", round(time.perf_counter() - t_all, 3))
        idx = final_index(ensure=False)
        report("index_keys", idx.count())
        report("index_multi_doc_keys", idx.filter("nd >= 2").count())
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        try:
            report("index_disk_bytes", int(
                subprocess.check_output(["du", "-sb", wh]).split()[0]
            ))
        except Exception:
            pass

    if "incremental" in phases and n_batches >= 2:
        # Daily-increment contract at this scale: rebuild index_{K-1}
        # cheaply? No — it was dropped; instead derive it from the final
        # index minus the last batch's contribution, which is exactly
        # build_span_index(batch_K) subtracted keywise. Equivalent and
        # avoids a second K-1 merge chain.
        t0 = time.perf_counter()
        last = batch_df(spark, ndocs, n_batches, n_batches - 1, period,
                        dup_per_100, mixer)
        last_idx = build_span_index(last, window=WINDOW)
        # NB: union form — correct at any scale but the index side of
        # the join below exchanges; at probe scales past the free-disk
        # budget run the phase-split CLI without "incremental" (the
        # contract is pinned at tiny scale and recorded at 20M/80M).
        idx_full = final_index(ensure=True)
        idx_prev = (
            idx_full.join(
                last_idx.withColumnRenamed("nd", "__nd_last"), "__key", "left"
            )
            .select(
                "__key",
                (F.col("nd") - F.coalesce("__nd_last", F.lit(0))).alias("nd"),
            )
            .filter(F.col("nd") >= 1)
        )
        inc = incremental_span_dup_stats(last, idx_prev, window=WINDOW)
        inc_dup = inc.filter("n_dup_spans > 0").count()
        report("incremental_last_batch_docs_dup", inc_dup)
        report("incremental_s", round(time.perf_counter() - t0, 3))
        inc_check = inc_dup  # compared against pass-2 in "score"; a local
        # so an incremental-only run never leaks an internal key into the
        # emitted JSON (r10 advisor)

    if "score" in phases:
        t_all = time.perf_counter()
        for n in _final_names(n_batches, parts):
            _ensure_registered(spark, db, n, params)
        idx = None if parts else spark.table(final_tbl)
        total_dup = 0
        total_scored = 0
        per_batch = []
        stats_frames = []
        for i in range(n_batches):
            t0 = time.perf_counter()
            batch = batch_df(spark, ndocs, n_batches, i, period,
                             dup_per_100, mixer)
            rollup = _span_rollup(batch, "text", "doc_id", WINDOW)
            if parts:
                # Per-partition joins (bucketed index side never moves),
                # unioned BEFORE the per-doc finalize — a doc's spans
                # land in several partitions. The rollup is spooled to a
                # partitioned temp dir once (∝ batch) so the P branches
                # read slices instead of recomputing the batch rollup.
                rdir = _warehouse_path(
                    spark, db,
                    f"rollup_tmp_b{i}" if collect_stats else "rollup_tmp",
                )
                (
                    rollup.withColumn("__part", _part_expr(parts))
                    .write.mode("overwrite").partitionBy("__part")
                    .parquet(rdir)
                )
                joined = None
                for p in range(parts):
                    rp = _read_part(
                        spark, rdir, p,
                        "`__key` binary, doc_id bigint, n_occ bigint",
                    )
                    b = rp.join(
                        spark.table(f"{db}.idx_v{n_batches - 1}_p{p}"),
                        "__key",
                    )
                    joined = b if joined is None else joined.unionByName(b)
            else:
                joined = rollup.join(idx, "__key")  # every batch key is indexed
            stats = _span_finalize(
                joined.select(
                    "doc_id", "n_occ",
                    F.when(F.col("nd") >= 2, F.col("n_occ"))
                    .otherwise(F.lit(0)).alias("__dup_occ"),
                ),
                "doc_id",
            )
            if collect_stats:
                stats_frames.append(stats)
            agg = stats.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("n_dup_spans") > 0).cast("long")).alias("d"),
            ).collect()[0]
            total_scored += agg["n"]
            total_dup += int(agg["d"] or 0)
            per_batch.append(int(agg["d"] or 0))
            if parts and not collect_stats:
                # counts are materialized; with collect_stats the lazy
                # _stats_df still reads these dirs, so the caller owns
                # their cleanup (test-only path)
                shutil.rmtree(rdir, ignore_errors=True)
            report(f"score_{i}_s", round(time.perf_counter() - t0, 3))
        report("span_docs_scored", total_scored)
        report("span_docs_dup", total_dup)
        report("span_docs_dup_per_batch", per_batch)
        report("score_total_s", round(time.perf_counter() - t_all, 3))
        if inc_check is not None:
            match = inc_check == per_batch[-1]
            report("incremental_equals_full_restriction", match)
            if not match:
                raise SystemExit(
                    "incremental last-batch verdicts diverged from the "
                    "full-corpus restriction — the ∪-contract is violated"
                )
        if collect_stats:
            from functools import reduce

            out["_stats_df"] = reduce(lambda a, b: a.unionByName(b),
                                      stats_frames)
    return out


def main() -> None:
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    phases = set(
        (sys.argv[3] if len(sys.argv) > 3 else "build,score,incremental")
        .split(",")
    )
    period = int(sys.argv[4]) if len(sys.argv) > 4 else 4_000_000_553
    db = os.environ.get("SPAN_PROBE_DB", "span_probe")
    parts = int(os.environ.get("SPAN_PROBE_PARTS", "0"))
    spark = get_spark(app_name=f"span_incremental_probe_{ndocs}")
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, ndocs, n_batches, period=period, phases=phases, db=db,
              parts=parts)
    # Full campaign (build+score): the numbers are the artifact, leave no
    # stored state behind. A partial run (build-only, or score against a
    # prior build) must KEEP the index — dropping it here made the
    # advertised phase-split CLI unusable across invocations (r10 review).
    names = _final_names(n_batches, parts)
    if {"build", "score"} <= phases:
        for name in names:
            _drop_index(spark, db, name)
    else:
        print(
            f"SPANPROBE keeping {db}.{{{','.join(names)}}} for follow-up "
            "phases",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
