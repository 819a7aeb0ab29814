"""Continuous-aggregate (hypertable rollup) tests: incremental refresh +
rollup∪tail reads must equal direct aggregation of all raw data."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.operators.rollup_table import EventRollup


@pytest.fixture()
def roll(spark):
    root = tempfile.mkdtemp(prefix="rollup_")
    yield EventRollup(spark, root)
    shutil.rmtree(root, ignore_errors=True)


def _direct(events):
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_millis("w.start").alias("bucket_ms"), "event_type", "n", "sum_value"
        )
    )


def _rows(df):
    return sorted(map(tuple, df.select("bucket_ms", "event_type", "n", "sum_value").collect()))


def test_query_matches_direct_after_incremental_refreshes(spark, roll):
    events = load_table(spark, SF_DIR, "events").persist()
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]

    # Phase 1: only the first half of history has arrived; refresh.
    first = events.filter(F.col("event_id") <= cut)
    hwm1 = roll.refresh(first)
    assert hwm1 > 0 and hwm1 % 3_600_000 == 0  # complete-bucket boundary
    assert _rows(roll.query(first)) == _rows(_direct(first))

    # Phase 2: the rest arrives; incremental refresh advances the HWM.
    hwm2 = roll.refresh(events)
    assert hwm2 >= hwm1
    assert _rows(roll.query(events)) == _rows(_direct(events))


def test_unrefreshed_read_still_correct(spark, roll):
    """Before any refresh the rollup is empty — query() must fall back to
    aggregating raw (correctness never depends on refresh recency)."""
    events = load_table(spark, SF_DIR, "events")
    assert _rows(roll.query(events)) == _rows(_direct(events))
