"""Bucketed co-located join: the equi-join of two tables bucketed on the
join key must plan with ZERO shuffle exchanges — the write-once-shuffle
layout contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tools.explain_audit import audit
from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.operators.bucketing import (
    drop_table,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, SF_DIR, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(o, "t_o_bucketed", "l_orderkey", n_buckets=8)
    yield
    drop_table(spark, "t_li_bucketed")
    drop_table(spark, "t_o_bucketed")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    li = read_table(spark, "t_li_bucketed")
    o = read_table(spark, "t_o_bucketed")
    joined = li.join(o, "l_orderkey")
    a = audit(joined)
    assert a["shuffles"] == 0, "bucketed equi-join must not re-shuffle"

    # and it is correct
    want = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == want


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    li = read_table(spark, "t_li_bucketed")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    assert audit(agg)["shuffles"] == 0, "bucketed groupBy on the bucket key"


def test_incremental_dedup_index_bucketed_single_shuffle(spark):
    """The stored LSH dedup index bucketed on (band, bh) joins a new batch's
    band buckets with at most ONE exchange — the new batch's side. The
    stored corpus index (the big side at 100 TB) is never re-shuffled."""
    from stackai_vector_db_spark.operators.dedup import build_minhash_index

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    _, old_banded = build_minhash_index(old)
    write_bucketed(old_banded, "t_lsh_idx", "band", "bh", n_buckets=8)
    try:
        stored = read_table(spark, "t_lsh_idx")
        _, new_banded = build_minhash_index(new)
        joined = new_banded.join(
            stored.withColumnRenamed("doc_id", "old_id"), ["band", "bh"]
        )
        assert joined.count() > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the bucketed scan must not sit under an Exchange: exactly the
        # new-batch side shuffles (sort-merge) or neither (broadcast)
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, plan
    finally:
        drop_table(spark, "t_lsh_idx")
