"""SQL-API parity: the engine's operators are all declarative, so the same
plans must be expressible as plain ``spark.sql`` text over temp views —
the DataFrame and SQL front-ends are interchangeable surfaces."""

from __future__ import annotations

from tests.conftest import SF_DIR
from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.queries import REGISTRY


def test_flagship_knn_as_pure_sql(spark):
    load_table(spark, SF_DIR, "embeddings").createOrReplaceTempView("embeddings_v")
    got = spark.sql(
        """
        WITH q AS (
          SELECT vec_id AS qid, embedding AS qvec
          FROM embeddings_v WHERE vec_id < 8),
        scored AS (
          SELECT q.qid, v.vec_id,
                 round(sqrt(aggregate(
                   zip_with(q.qvec, v.embedding,
                            (x, y) -> power(double(x) - double(y), 2)),
                   0D, (acc, x) -> acc + x)), 6) AS dist
          FROM q CROSS JOIN embeddings_v v),
        ranked AS (
          SELECT qid, vec_id, dist,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
          FROM scored)
        SELECT qid, vec_id, dist, rnk FROM ranked WHERE rnk <= 10
        """
    )
    want = REGISTRY["q_knn_brute_topk"].fn(spark, SF_DIR)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_fake_embed_as_pure_sql(spark):
    """The embedding formula is expressible in SQL higher-order functions —
    char-sum via aggregate over split, components via transform."""
    from pyspark.sql import functions as F

    from stackai_vector_db_spark.functions.vector import fake_embedding

    df = spark.createDataFrame([("Hello Spark World",)], "text string")
    df.createOrReplaceTempView("one_doc_v")
    got = spark.sql(
        """
        WITH c AS (SELECT lower(trim(text)) AS t FROM one_doc_v),
        p AS (SELECT aggregate(split(t, ''), 0L, (a, ch) -> a + ascii(ch)) AS cs,
                     length(t) AS l,
                     size(split(t, '\\\\s+')) AS w
              FROM c)
        SELECT transform(sequence(0, 7),
                 i -> double((cs * (i+1) + l * (i+7) + w * (i+13)) % 1000)
                      / 1000.0 - 0.5) AS e
        FROM p
        """
    ).collect()[0]["e"]
    want = df.select(fake_embedding(F.col("text"), 8).alias("e")).collect()[0]["e"]
    assert got == want
