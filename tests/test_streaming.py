"""Streaming/batch parity tests (SURVEY.md §5.2: streaming is validated by
parity with batch results, since the reference has no streaming to diff)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_finite,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark):
    batch = tumbling_agg(load_table(spark, SF_DIR, "events"))
    stream = run_finite(
        tumbling_agg(read_events_stream(spark, SF_DIR)), "t_tumbling", "complete"
    )
    cols = ["win_start_ms", "event_type", "n", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_sliding_stream_matches_batch(spark):
    batch = sliding_agg(load_table(spark, SF_DIR, "events"))
    stream = run_finite(
        sliding_agg(read_events_stream(spark, SF_DIR)), "t_sliding", "complete"
    )
    cols = ["win_start_ms", "event_type", "n", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_session_stream_matches_batch(spark):
    batch = session_agg(load_table(spark, SF_DIR, "events"))
    stream = run_finite(
        session_agg(read_events_stream(spark, SF_DIR)), "t_session", "complete"
    )
    cols = ["user_id", "sess_start_ms", "n", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_dedup_within_watermark(spark):
    stream = run_finite(
        dedup_within_watermark(read_events_stream(spark, SF_DIR)).select("event_id"),
        "t_dedup",
        "append",
    )
    n_distinct = (
        load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    )
    got = stream.count()
    assert got == n_distinct


def test_stateful_running_totals_matches_batch(spark):
    """applyInPandasWithState per-user totals: after draining the finite
    stream, the latest emitted state per user must equal the batch
    aggregate (custom-stateful-operator parity)."""
    from stackai_vector_db_spark.streaming.stateful import running_user_totals

    stream = run_finite(
        running_user_totals(read_events_stream(spark, SF_DIR)),
        "t_stateful",
        "update",
    )
    # update mode re-emits a key per micro-batch; availableNow on one file
    # yields one batch, but be robust: keep the max-n (latest) row per user.
    latest = (
        stream.groupBy("user_id")
        .agg(F.max(F.struct("n", "sum_value")).alias("m"))
        .select("user_id", F.col("m.n").alias("n"), F.col("m.sum_value").alias("sum_value"))
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )
    cols = ["user_id", "n", "sum_value"]
    assert _rows(latest, cols) == _rows(batch, cols)


def test_incremental_index_stream(spark):
    """Streaming J3: file-arrival vectors assigned to static centroids must
    reproduce the batch assignment exactly (reference ivf.py:168-196)."""
    from stackai_vector_db_spark.operators.ivf import assign_clusters, label_mean_centroids
    from stackai_vector_db_spark.streaming.events import incremental_index_stream

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = label_mean_centroids(emb)

    tmp = tempfile.mkdtemp(prefix="ivf_stream_")
    in_dir, out_dir = f"{tmp}/in", f"{tmp}/out"
    try:
        # Simulate incremental arrival: the vector table split across files.
        emb.repartition(4).write.parquet(in_dir)
        incremental_index_stream(spark, in_dir, cents, out_dir)

        got = spark.read.parquet(out_dir).select("vec_id", "cluster_id")
        want = assign_clusters(emb, cents).select("vec_id", "cluster_id")
        assert _rows(got, ["vec_id", "cluster_id"]) == _rows(
            want, ["vec_id", "cluster_id"]
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
