"""Salted-operator parity tests: salting must never change results, only
the shuffle shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.operators.skew import salted_collect_list, salted_join


def test_salted_join_parity(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")

    plain = li.join(o, "l_orderkey").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s")
    )
    salted = salted_join(li, o, "l_orderkey", n_salts=8).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_scatters_hot_key(spark):
    """A hot key's rows must land in >1 salt bucket (the whole point)."""
    hot = spark.createDataFrame([(1, i) for i in range(500)], "k long, v long")
    from stackai_vector_db_spark.operators.skew import _salt_col

    n = hot.withColumn("__salt", _salt_col(hot, 8)).select("__salt").distinct().count()
    assert n > 4


def test_salted_collect_list_parity(spark):
    e = load_table(spark, SF_DIR, "events").select("user_id", "event_id")
    plain = (
        e.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("event_id")).alias("items"))
    )
    salted = salted_collect_list(e, "user_id", "event_id", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
