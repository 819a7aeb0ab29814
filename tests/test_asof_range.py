"""Unit tests for the as-of and banded range join operators (edge
semantics beyond the oracle parity check)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tools.explain_audit import audit
from stackai_vector_db_spark.operators.asof import asof_join_backward
from stackai_vector_db_spark.operators.range_join import banded_range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 101, _ts("2024-01-01T10:00:00")),  # after v2 → matches v2
            (1, 102, _ts("2024-01-01T08:00:00")),  # equal ts → matches v1
            (1, 103, _ts("2024-01-01T07:00:00")),  # before all views → null
            (2, 201, _ts("2024-01-01T12:00:00")),  # other key, no views → null
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 11, _ts("2024-01-01T08:00:00")),
            (1, 12, _ts("2024-01-01T08:00:00")),  # dup ts → max id (12) wins
            (1, 13, _ts("2024-01-01T09:00:00")),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = {
        r.event_id: r.matched_id
        for r in asof_join_backward(
            left, right, key="user_id", ts="ts",
            right_payload=["ts"], right_id="event_id",
        ).collect()
    }
    assert out == {101: 13, 102: 12, 103: None, 201: None}


def test_banded_range_join_matches_naive(spark):
    pts = spark.range(0, 500).select((F.col("id") % 97 / 2.0).alias("x"))
    bands = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 7.5, 21.3), (2, 21.3, 48.6)],  # overlapping + odd edges
        "band_id int, lo double, hi double",
    )
    naive = pts.join(
        bands, (F.col("lo") <= F.col("x")) & (F.col("x") < F.col("hi"))
    ).groupBy("band_id").count()
    banded = banded_range_join(
        pts, bands, "x", "lo", "hi", bucket_width=4.0
    ).groupBy("band_id").count()
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, banded.collect()))


def test_banded_range_join_is_hash_not_loop(spark):
    from tests.conftest import SF_DIR
    from stackai_vector_db_spark.queries import REGISTRY

    a = audit(REGISTRY["q_range_join"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in a["joins"]
    assert "CartesianProduct" not in a["joins"]
    assert "BroadcastHashJoin" in a["joins"]
