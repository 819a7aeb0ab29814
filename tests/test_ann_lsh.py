"""ANN-LSH tests: bucket determinism, multi-probe candidate reduction, and
recall against the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.operators.ann_lsh import (
    ann_lsh_topk,
    bucket_col,
    plane,
)
from stackai_vector_db_spark.operators.knn import brute_force_topk

DIM = 64
K = 10


def _queries(emb, nq=5):
    return emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_plane_formula_deterministic():
    p0 = plane(0, 4)
    assert p0 == plane(0, 4)
    assert p0 != plane(1, 4)
    assert all(-0.5 <= x < 0.5 for x in p0)


def test_buckets_partition_the_space(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    b = emb.select(bucket_col(F.col("embedding"), 6, DIM).alias("bucket"))
    stats = b.agg(
        F.countDistinct("bucket").alias("nb"),
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
    ).collect()[0]
    assert stats.nb > 4            # vectors spread over multiple buckets
    assert 0 <= stats.lo and stats.hi < 64


def test_candidates_shrink_vs_full_scan(spark):
    """The probed candidate set must be well under the full N×Q cross join —
    the entire point of bucketing."""
    emb = load_table(spark, SF_DIR, "embeddings").persist()
    n = emb.count()
    q = _queries(emb)
    from stackai_vector_db_spark.operators.ann_lsh import probe_buckets_col

    bucketed = emb.withColumn("bucket", bucket_col(F.col("embedding"), 6, DIM))
    probes = q.select(
        "qid",
        F.explode(
            probe_buckets_col(bucket_col(F.col("qvec"), 6, DIM), 6)
        ).alias("bucket"),
    )
    cand = bucketed.join(probes, "bucket").count()
    assert cand < 0.8 * n * q.count()


def test_recall_beats_random_probing(spark):
    """Hamming-1 multi-probe visits ~7/64 ≈ 11% of the bucket space, so a
    structure-free hash would land ~0.11 recall. The fixture's synthetic
    vectors are near-orthogonal (little angular structure to exploit), so
    the contract is 'well above random', not a high absolute floor."""
    emb = load_table(spark, SF_DIR, "embeddings").persist()
    q = _queries(emb)
    exact = {
        (r.qid, r.vec_id)
        for r in brute_force_topk(q, emb, K, metric="cosine").collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in ann_lsh_topk(q, emb, K, dim=DIM, n_planes=6).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.25, f"LSH recall {recall:.2f} not above random baseline"
