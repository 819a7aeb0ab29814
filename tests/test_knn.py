"""kNN operator tests (reference tests/test_indexes.py:47-296 analog)."""

from __future__ import annotations

from stackai_vector_db_spark.operators.knn import brute_force_topk


def _orthogonal_fixture(spark):
    """5 orthogonal-ish unit vectors (reference tests/test_indexes.py:53-61)."""
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, [0.7071, 0.7071, 0.0]),
        (4, [0.0, 0.7071, 0.7071]),
    ]
    return spark.createDataFrame(vecs, "vec_id long, embedding array<float>")


def test_exact_match_top1(spark):
    vectors = _orthogonal_fixture(spark)
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], "qid long, qvec array<float>")
    got = brute_force_topk(q, vectors, 1).collect()
    assert len(got) == 1
    assert got[0]["vec_id"] == 0
    assert got[0]["dist"] == 0.0


def test_ascending_distance_order(spark):
    vecs = [(i, [float(i), 0.0]) for i in range(4)]
    vectors = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(0, [0.0, 0.0])], "qid long, qvec array<float>")
    got = brute_force_topk(q, vectors, 4).collect()
    dists = [r["dist"] for r in sorted(got, key=lambda r: r["rank"])]
    assert dists == sorted(dists)
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == [0, 1, 2, 3]


def test_k_clamp_beyond_rowcount(spark):
    """k > dataset size clamps (reference base.py:160-166)."""
    vectors = _orthogonal_fixture(spark)
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], "qid long, qvec array<float>")
    got = brute_force_topk(q, vectors, 100).collect()
    assert len(got) == 5


def test_prereduce_matches_window(spark):
    from stackai_vector_db_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").repartition(6)
    q = emb.filter("vec_id < 4").selectExpr("vec_id as qid", "embedding as qvec")
    a = brute_force_topk(q, emb, 7, metric="euclidean", strategy="window")
    b = brute_force_topk(q, emb, 7, metric="euclidean", strategy="prereduce")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb

    ca = brute_force_topk(q, emb, 7, metric="cosine", strategy="window")
    cb = brute_force_topk(q, emb, 7, metric="cosine", strategy="prereduce")
    assert sorted(map(tuple, ca.collect())) == sorted(map(tuple, cb.collect()))
