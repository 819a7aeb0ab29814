"""Product-quantization operator tests (extension — no reference counterpart;
the reference caps at raw float32 in memory, app/core/config.py:48).

Mirrors the reference's test principle "linear scan is the exactness
baseline" (README.md:283): ADC quality is measured as recall against
``brute_force_topk`` on the same table.
"""

from __future__ import annotations

import numpy as np
import pytest

from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.operators.knn import brute_force_topk
from stackai_vector_db_spark.operators.pq import (
    adc_topk,
    codebooks_to_df,
    df_to_codebooks,
    encode_pq,
    recall_at_k,
    train_pq,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").cache()


@pytest.fixture(scope="module")
def codebooks(spark, emb):
    return train_pq(emb, m=8, n_codes=256, seed=42)


def test_train_shapes(codebooks, emb):
    dim = len(emb.first()["embedding"])
    m, k, d_sub = codebooks.shape
    assert (m, d_sub) == (8, dim // 8)
    assert k == 256
    assert np.isfinite(codebooks).all()


def test_train_deterministic(emb):
    a = train_pq(emb, m=4, n_codes=8, seed=42, max_iter=5)
    b = train_pq(emb, m=4, n_codes=8, seed=42, max_iter=5)
    assert np.array_equal(a, b)


def test_encode_codes_in_range_and_deterministic(spark, emb, codebooks):
    codes = encode_pq(emb, codebooks)
    rows = codes.orderBy("vec_id").collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 256 for c in r["codes"])
    rows2 = encode_pq(emb.repartition(7), codebooks).orderBy("vec_id").collect()
    assert [r["codes"] for r in rows] == [r["codes"] for r in rows2]


def test_codebook_roundtrip(spark, codebooks):
    df = codebooks_to_df(spark, codebooks)
    back = df_to_codebooks(df)
    assert np.allclose(codebooks, back)


def test_adc_self_query_exact_when_codes_cover_points(spark):
    """If every distinct subvector is its own centroid, ADC is exact."""
    vecs = [(i, [float(i % 4), float((i * 3) % 4)]) for i in range(8)]
    vdf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cb = train_pq(vdf, m=2, n_codes=8, seed=1, max_iter=50)
    codes = encode_pq(vdf, cb)
    q = spark.createDataFrame([(0, [0.0, 0.0])], "qid long, qvec array<float>")
    approx = adc_topk(q, codes, cb, k=8).collect()
    exact = brute_force_topk(q, vdf, k=8).collect()
    ad = {r["vec_id"]: r["dist"] for r in approx}
    ed = {r["vec_id"]: r["dist"] for r in exact}
    for vid, d in ed.items():
        assert ad[vid] == pytest.approx(d, abs=1e-5)


def test_adc_recall_floor(spark, emb, codebooks):
    """ADC top-30 recall of exact top-10 >= 0.85 on the fixture table (dim 64,
    m=8 -> 8-dim subspaces, 256 codes = 32x compression)."""
    qrows = emb.orderBy("vec_id").limit(4).collect()
    q = spark.createDataFrame(
        [(i, r["embedding"]) for i, r in enumerate(qrows)],
        "qid long, qvec array<float>",
    )
    codes = encode_pq(emb, codebooks)
    approx = adc_topk(q, codes, codebooks, k=30)
    exact = brute_force_topk(q, emb, k=10)
    # recall@30 vs exact top-10: every exact top-10 id should usually be in
    # the approximate top-30
    hits = exact.join(approx.select("qid", "vec_id"), ["qid", "vec_id"]).count()
    total = exact.count()
    assert hits / total >= 0.85
    assert recall_at_k(approx, approx, k=30) == 1.0


def test_self_neighbor_rank1(spark, emb, codebooks):
    """A vector queried against its own codes ranks itself first (its code
    reconstruction is nearest to itself in expectation)."""
    qrows = emb.orderBy("vec_id").limit(3).collect()
    q = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows], "qid long, qvec array<float>"
    )
    codes = encode_pq(emb, codebooks)
    top1 = adc_topk(q, codes, codebooks, k=5).filter("rank = 1").collect()
    self_hits = sum(1 for r in top1 if r["qid"] == r["vec_id"])
    assert self_hits >= 2  # allow one collision where another point shares codes


def test_ivf_pq_search_recall_and_subset(spark, emb, codebooks):
    """IVF-PQ candidates come only from probed clusters; with nprobe = C the
    result equals plain ADC (probe pruning is lossless at full probe)."""
    from pyspark.sql import functions as F

    from stackai_vector_db_spark.operators.ivf import (
        assign_clusters,
        label_mean_centroids,
    )
    from stackai_vector_db_spark.operators.pq import ivf_pq_search

    full = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    cents = label_mean_centroids(full)
    n_clusters = cents.count()
    assigned = assign_clusters(full, cents).select("vec_id", "cluster_id")
    codes = encode_pq(full, codebooks).join(assigned, "vec_id")
    qrows = full.orderBy("vec_id").limit(3).collect()
    q = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows], "qid long, qvec array<float>"
    )
    # Full probe == plain ADC over everything.
    full_probe = ivf_pq_search(q, codes, cents, codebooks, k=5, nprobe=n_clusters)
    plain = adc_topk(q, codes, codebooks, k=5)
    a = {(r["qid"], r["vec_id"], r["dist"]) for r in full_probe.collect()}
    b = {(r["qid"], r["vec_id"], r["dist"]) for r in plain.collect()}
    assert a == b
    # nprobe=1 returns <= k rows per query from the probed cluster only.
    one = ivf_pq_search(q, codes, cents, codebooks, k=5, nprobe=1)
    counts = one.groupBy("qid").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    joined = (
        one.join(codes.select("vec_id", "cluster_id"), "vec_id")
        .select("qid", "cluster_id")
        .distinct()
    )
    assert all(r is not None for r in joined.collect())


def test_ivf_pq_residual_exact_when_residuals_quantizable(spark):
    """Exactness property of the residual (IVFADC) path: when every
    cluster's residuals take at most n_codes distinct values per subspace,
    PQ quantization is LOSSLESS, so full-probe residual search must equal
    brute-force kNN exactly — distances included. Built by placing vectors
    at centroid + delta with delta drawn from a small set."""
    from stackai_vector_db_spark.operators.knn import brute_force_topk
    from stackai_vector_db_spark.operators.pq import (
        ivf_pq_residual_build,
        ivf_pq_residual_search,
    )

    dim = 8
    # Dyadic values only: exactly representable in float32/64, so every
    # difference/square/sum is exact regardless of accumulation order and
    # the two plans' distances agree bit-for-bit, not just to 6 decimals.
    deltas = [
        [0.0] * dim,
        [0.5] + [0.0] * (dim - 1),
        [0.0, -0.25] + [0.0] * (dim - 2),
        [0.125] * dim,
    ]
    cents_py = [[float(10 * c + 1)] * dim for c in range(3)]
    rows = []
    vid = 0
    for c, cent in enumerate(cents_py):
        for d in deltas:
            rows.append((vid, [cent[i] + d[i] for i in range(dim)], c))
            vid += 1
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = spark.createDataFrame(
        [(c, cents_py[c]) for c in range(3)],
        "cluster_id int, centroid array<double>",
    )
    cb, coded = ivf_pq_residual_build(
        vecs, cents, m=4, n_codes=len(deltas), seed=1
    )
    qrows = [(r[0], r[1]) for r in rows[:5]]
    q = spark.createDataFrame(qrows, "qid long, qvec array<float>")
    got = ivf_pq_residual_search(q, coded, cents, cb, k=4, nprobe=3)
    want = brute_force_topk(q, vecs, 4)
    a = {(r["qid"], r["vec_id"], r["dist"], r["rank"]) for r in got.collect()}
    b = {(r["qid"], r["vec_id"], r["dist"], r["rank"]) for r in want.collect()}
    assert a == b


def test_ivf_pq_residual_parity_envelope_and_determinism(spark, emb, codebooks):
    """On the synthetic fixture (within-cluster variance ~ total variance)
    residual encoding measures ~par with raw PQ — assert the parity
    envelope (no silent quality cliff) and bit-identical reruns."""
    from stackai_vector_db_spark.operators.ivf import (
        assign_clusters,
        label_mean_centroids,
    )
    from stackai_vector_db_spark.operators.knn import brute_force_topk
    from stackai_vector_db_spark.operators.pq import (
        ivf_pq_residual_build,
        ivf_pq_residual_search,
        ivf_pq_search,
        recall_at_k,
    )

    full = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    cents = label_mean_centroids(full)
    n_clusters = cents.count()
    qrows = full.orderBy("vec_id").limit(8).collect()
    q = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows], "qid long, qvec array<float>"
    )
    exact = brute_force_topk(q, full, 10)
    assigned = assign_clusters(full, cents).select("vec_id", "cluster_id")
    raw_codes = encode_pq(full, codebooks).join(assigned, "vec_id")
    raw = ivf_pq_search(q, raw_codes, cents, codebooks, k=10, nprobe=n_clusters)
    cb_r, coded_r = ivf_pq_residual_build(full, cents, m=8, n_codes=256, seed=42)
    res = ivf_pq_residual_search(q, coded_r, cents, cb_r, k=10, nprobe=n_clusters)
    r_raw = recall_at_k(raw, exact, 10)
    r_res = recall_at_k(res, exact, 10)
    assert r_res >= r_raw - 0.15  # parity envelope, not superiority
    res2 = ivf_pq_residual_search(q, coded_r, cents, cb_r, k=10, nprobe=n_clusters)
    a = {(r["qid"], r["vec_id"], r["dist"]) for r in res.collect()}
    b = {(r["qid"], r["vec_id"], r["dist"]) for r in res2.collect()}
    assert a == b


def test_rerank_exact_refine(spark, emb, codebooks):
    """Refine stage: exact re-rank of an ADC shortlist. With a shortlist
    covering the whole table the result must EQUAL brute force; with a
    bounded shortlist, refined recall@10 must be at least ADC's."""
    from stackai_vector_db_spark.operators.knn import rerank_exact

    qrows = emb.orderBy("vec_id").limit(4).collect()
    q = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows], "qid long, qvec array<float>"
    )
    codes = encode_pq(emb, codebooks)
    n = emb.count()
    exact = brute_force_topk(q, emb, k=10)

    # shortlist == corpus -> refine IS brute force (same dist, same order)
    full_short = adc_topk(q, codes, codebooks, k=n)
    refined_full = rerank_exact(full_short, emb, q, k=10)
    def key(df):
        return sorted(
            (r["qid"], r["vec_id"], r["dist"], r["rank"]) for r in df.collect()
        )
    assert key(refined_full) == key(exact)

    # bounded shortlist: refined recall >= raw ADC recall
    short = adc_topk(q, codes, codebooks, k=50)
    refined = rerank_exact(short, emb, q, k=10)
    assert recall_at_k(refined, exact, 10) >= recall_at_k(
        adc_topk(q, codes, codebooks, k=10), exact, 10
    )


def test_refine_recall_floor_clustered(spark):
    """Absolute refine-recall floor at a size where shortlist depth
    actually matters (r4 verdict #3): on the 100k clustered probe geometry
    depth 50 scores 0.64 and depth 100 scores 0.90, so the configured
    depth-200 shortlist (0.2% of the corpus — `tools/refine_sweep.py`
    measured the knee at ~0.1% of 200k) must clear 0.9. Everything here is
    deterministic (hash-mixed generator, seeded train, pinned partitions),
    so the measured 1.0 cannot drift run-to-run — the floor guards code
    changes, not sampling noise. Reference analog: IVF recall tolerance
    (reference README.md:322-330)."""
    from pyspark.sql import functions as F

    from stackai_vector_db_spark.operators.knn import rerank_exact
    from tools.scale_probe import synth_vectors

    n, depth = 100_000, 200
    vecs = synth_vectors(spark, n, 64, 32, mode="clustered").persist()
    vecs.count()
    q = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = brute_force_topk(q, vecs, 10, strategy="prereduce")
    cb = train_pq(vecs, m=8, n_codes=256, seed=42, sample_cap=20_000)
    codes = encode_pq(vecs, cb)
    refined = rerank_exact(adc_topk(q, codes, cb, k=depth), vecs, q, 10)
    assert recall_at_k(refined, exact, 10) >= 0.9
    vecs.unpersist()


def test_committed_artifacts_match_deterministic_rebuild(spark, emb):
    """The committed artifacts under artifacts/pq/ are the bytes BOTH the
    Spark queries and the DuckDB oracles consume — this pins them to what
    the current train/encode code produces, so a codebook-affecting change
    fails here instead of as a silent oracle drift."""
    from stackai_vector_db_spark.plans import pq_index

    key = pq_index.corpus_key(spark, SF_DIR)
    loaded = pq_index.load_pq_index(spark, key, "raw")
    assert loaded is not None, "fixture artifacts missing — rebuild and commit"
    art_cb, art_codes = loaded

    cb = train_pq(emb, m=8, n_codes=64, seed=42)
    assert np.array_equal(cb, art_cb)
    codes = encode_pq(emb, cb)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    want = {r["vec_id"]: list(r["codes"]) for r in art_codes.collect()}
    assert got == want

    # residual variant: codebooks + coded(vec_id, codes, cluster_id)
    from stackai_vector_db_spark.operators.ivf import label_mean_centroids
    from stackai_vector_db_spark.operators.pq import ivf_pq_residual_build

    res = pq_index.load_pq_index(spark, key, "residual")
    assert res is not None
    art_rcb, art_coded = res
    full = load_table(spark, SF_DIR, "embeddings")
    cents = label_mean_centroids(full)
    rcb, coded = ivf_pq_residual_build(full, cents, m=8, n_codes=64, seed=42)
    assert np.array_equal(rcb, art_rcb)
    got_r = {
        r["vec_id"]: (list(r["codes"]), r["cluster_id"]) for r in coded.collect()
    }
    want_r = {
        r["vec_id"]: (list(r["codes"]), r["cluster_id"])
        for r in art_coded.collect()
    }
    assert got_r == want_r


def test_codes_cover_corpus_guard(spark, emb):
    """The row-count corpus key can collide with an unrelated table;
    codes_cover_corpus must accept the true corpus' codes and reject a
    same-cardinality table with a different id set."""
    from stackai_vector_db_spark import queries as Q
    from stackai_vector_db_spark.plans import pq_index

    _, codes = Q._pq_artifacts(spark, SF_DIR)
    assert pq_index.codes_cover_corpus(emb, codes)
    from pyspark.sql import functions as F

    shifted = emb.select((F.col("vec_id") + 7).alias("vec_id"), "embedding")
    assert not pq_index.codes_cover_corpus(shifted, codes)


def test_pq_artifacts_rebuild_on_key_collision(spark, monkeypatch, tmp_path):
    """A loaded artifact that fails the coverage guard must be discarded
    and rebuilt from the actual corpus — colliding counts never serve
    another table's codes.  The rebuild's persist is redirected to a tmp
    root: the committed repo artifacts must never churn from a test run
    (every rewrite renames the part files and dirties the git tree)."""
    from pyspark.sql import functions as F

    from stackai_vector_db_spark import queries as Q
    from stackai_vector_db_spark.plans import pq_index

    _, good = Q._pq_artifacts(spark, SF_DIR)  # committed artifact, valid
    wrong = good.select((F.col("vec_id") + 7).alias("vec_id"), "codes")
    real_load = pq_index.load_pq_index
    real_write = pq_index.write_pq_index
    calls = {"n": 0}

    def _redirected(fn, *args, **kwargs):
        old_root = pq_index.ARTIFACT_ROOT
        pq_index.ARTIFACT_ROOT = str(tmp_path)
        try:
            return fn(*args, **kwargs)
        finally:
            pq_index.ARTIFACT_ROOT = old_root

    def fake_load(s, key, variant="raw"):
        calls["n"] += 1
        if calls["n"] == 1:  # first load: the colliding artifact
            cb, _ = real_load(s, key, variant)
            return cb, wrong
        return _redirected(real_load, s, key, variant)  # reload the rebuild

    def fake_write(key, cb_df, codes, variant="raw"):
        _redirected(real_write, key, cb_df, codes, variant)

    monkeypatch.setattr(pq_index, "load_pq_index", fake_load)
    monkeypatch.setattr(pq_index, "write_pq_index", fake_write)
    Q._PQ_ARTIFACTS.clear()
    emb = load_table(spark, SF_DIR, "embeddings")
    _, codes = Q._pq_artifacts(spark, SF_DIR)
    Q._PQ_ARTIFACTS.clear()
    assert pq_index.codes_cover_corpus(emb, codes)


def test_pq_artifacts_survive_readonly_root(spark, monkeypatch):
    """A missing artifact on an unwritable install must degrade to the
    in-memory build, not crash the query path."""
    from stackai_vector_db_spark import queries as Q
    from stackai_vector_db_spark.plans import pq_index

    def no_load(s, key, variant="raw"):
        return None

    def no_write(*a, **k):
        raise OSError("read-only artifact root")

    monkeypatch.setattr(pq_index, "load_pq_index", no_load)
    monkeypatch.setattr(pq_index, "write_pq_index", no_write)
    Q._PQ_ARTIFACTS.clear()
    codebooks, codes = Q._pq_artifacts(spark, SF_DIR)
    Q._PQ_ARTIFACTS.clear()
    assert codebooks.shape[0] == 8 and codes.count() > 0


def test_load_or_rebuild_survives_corrupt_artifact():
    """A half-written artifact dir (process killed mid-write leaves only a
    _temporary/ subdir, which Spark reads as UNABLE_TO_INFER_SCHEMA) must
    trigger the deterministic rebuild like a missing artifact — not poison
    every query until the dir is hand-deleted (round-5 review)."""
    from stackai_vector_db_spark.plans.pq_index import load_or_rebuild

    calls = []

    def corrupt_load():
        calls.append("load")
        raise RuntimeError("UNABLE_TO_INFER_SCHEMA: corrupt artifact dir")

    art = load_or_rebuild(
        corrupt_load,
        valid=lambda a: True,
        build=lambda: "built",
        persist=lambda a: None,
    )
    assert art == "built"
    assert calls == ["load", "load"]  # first load AND post-persist re-load
