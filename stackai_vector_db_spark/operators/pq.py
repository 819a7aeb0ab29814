"""Product Quantization (PQ) — compressed vectors + asymmetric-distance search.

No reference counterpart (extension operator): the reference stores raw
float32 vectors and caps at 10k chunks/library (``app/core/config.py:48``);
at 100 TB the vector payload itself is the bottleneck (1024-dim float32 =
4 KB/row). PQ (Jégou et al., "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011) splits each D-dim vector into M subspaces,
k-means-quantizes each subspace to one of K codes, and stores M small ints
per vector — a D·4/M-byte → M-byte compression (e.g. 64× for D=1024, M=64,
K=256). Search uses the Asymmetric Distance Computation (ADC) trick: per
query, precompute an M×K lookup table of exact subspace distances, then a
vector's approximate distance is a sum of M table lookups — no float vector
ever read at query time.

Spark decomposition (the scale story):

- **train**: codebooks are tiny (M·K·D/M floats) and training needs only a
  bounded sample — the standard practice (FAISS trains on ~100k-1M samples
  regardless of corpus size). We take a *deterministic* hash-sample, pull it
  to the driver, and run seeded Lloyd iterations in numpy. Train cost is
  O(sample); independent of corpus size.
- **encode**: embarrassingly parallel `mapInPandas` — each Arrow batch
  argmin's B×K subspace distances per subspace. Scales linearly, no shuffle.
- **search**: the codes table (M bytes/row instead of 4 KB/row) is the only
  thing scanned; ADC in a vectorized per-partition kernel emits local top-k
  per query, and the exact final window ranks Q·k·P survivors — same
  prereduce shape as ``operators/knn.py``.

Determinism: sampling is id-hash based, k-means init is a seeded
permutation, argmin ties resolve to the lowest code index, distances round
to 6 decimals before ranking with id tie-breaks — repeated runs produce
identical codes and identical rankings (rows-only driver check stays
stable; recall is tested against exact kNN in ``tests/test_pq.py``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from stackai_vector_db_spark.operators.knn import _rank_topk

ROUND = 6


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    max_iter: int = 25,
    sample_cap: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks on a deterministic bounded sample.

    Returns ``codebooks`` of shape (m, n_codes, d_sub) float64. The sample is
    chosen by id-hash (stable across runs and partitionings) and capped at
    ``sample_cap`` rows by smallest id — train cost never grows with the
    corpus.
    """
    total = vectors.count()
    if total == 0:
        raise ValueError("cannot train PQ on an empty vector table")
    # Deterministic hash-sample targeting ~2x the cap, then exact cap by id.
    pct = min(100, max(1, int(200 * sample_cap / total))) if total > sample_cap else 100
    sample = vectors.select(id_col, vec_col)
    if pct < 100:
        sample = sample.filter(F.pmod(F.abs(F.hash(F.col(id_col))), F.lit(100)) < pct)
    rows = sample.orderBy(id_col).limit(sample_cap).collect()
    mat = np.array([r[1] for r in rows], dtype=np.float64)  # S × D
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    k = min(n_codes, mat.shape[0])
    # Subspaces train independently on thread workers — the Lloyd inner loop
    # is matmul-dominated and numpy releases the GIL there, so M subspaces
    # run near-M× parallel. Each gets its own deterministic seed stream
    # (order-independent, unlike sharing one generator across threads).
    from concurrent.futures import ThreadPoolExecutor

    codebooks = np.empty((m, k, d_sub), dtype=np.float64)

    def train_sub(sub: int) -> None:
        x = mat[:, sub * d_sub : (sub + 1) * d_sub]
        rng = np.random.default_rng(seed + 9973 * sub)
        codebooks[sub] = _lloyd(x, k, rng, max_iter)

    with ThreadPoolExecutor(max_workers=min(m, 16)) as ex:
        list(ex.map(train_sub, range(m)))
    return codebooks


def _lloyd(x: np.ndarray, k: int, rng: np.random.Generator, max_iter: int) -> np.ndarray:
    """Seeded Lloyd k-means; empty clusters keep their previous centroid.

    Mean update is a scatter-add (``np.add.at`` + ``bincount``), not a
    per-cluster mask loop — the mask loop is O(k·S) Python-side and
    dominates train time at k=256."""
    init_idx = rng.choice(x.shape[0], size=k, replace=False)
    cents = x[np.sort(init_idx)].copy()
    for _ in range(max_iter):
        d2 = _sq_dists(x, cents)
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < 1e-9:
            break
    return cents


def _sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Expansion-form |x|²−2x·c+|c|² pairwise squared distances — the
    BLAS-backed form for the hot training loops (Lloyd, encode), where the
    ~1e-13 cancellation error is irrelevant (argmin over well-separated
    centroids)."""
    return (
        (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
    )


def _lut_sq_dists(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Difference-form Σ(q−c)² for ADC lookup tables. The DuckDB oracles
    replay LUT entries as ``power(q − c, 2)`` sums over the persisted
    codebooks; computing the engine's LUTs in the SAME form removes the
    expansion form's ~1e-13 cancellation asymmetry, which could otherwise
    flip the 6-decimal distance rounding on a boundary value and flake a
    hash row (round-5 review). LUT shapes are tiny (Q×K×d_sub), so the
    extra temporary is noise."""
    return ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)


def _topk_idx(dists: np.ndarray, vids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the kk smallest by the engine's total order (dist, vid).

    argpartition gives the kk smallest distances in O(B); ties at the
    kth distance are then resolved exactly by a lexsort over only the
    threshold-passing rows (t ≈ kk, so O(B + t log t) replaces the old
    full O(B log B) sort). Tie-exactness keeps local pre-reduction
    lossless w.r.t. the global (dist, vec_id) window — the partitioning-
    invariance contract of tests/test_determinism.py."""
    b = dists.shape[0]
    if kk >= b:
        return np.lexsort((vids, dists))
    part_idx = np.argpartition(dists, kk - 1)[:kk]
    thr = dists[part_idx].max()
    cand = np.flatnonzero(dists <= thr)
    order = cand[np.lexsort((vids[cand], dists[cand]))]
    return order[:kk]


def codebooks_to_df(spark: SparkSession, codebooks: np.ndarray) -> DataFrame:
    """Codebooks as a (sub, code, centroid) DataFrame for parquet persistence."""
    rows = [
        (int(sub), int(code), [float(v) for v in codebooks[sub, code]])
        for sub in range(codebooks.shape[0])
        for code in range(codebooks.shape[1])
    ]
    return spark.createDataFrame(rows, "sub int, code int, centroid array<double>")


def df_to_codebooks(df: DataFrame) -> np.ndarray:
    rows = df.orderBy("sub", "code").collect()
    m = rows[-1]["sub"] + 1
    k = rows[-1]["code"] + 1
    d_sub = len(rows[0]["centroid"])
    out = np.empty((m, k, d_sub), dtype=np.float64)
    for r in rows:
        out[r["sub"], r["code"]] = r["centroid"]
    return out


def encode_pq(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to M-code arrays — distributed, shuffle-free.

    Output: ``vec_id long, codes array<int>``. Argmin ties resolve to the
    lowest code index (numpy argmin contract) — deterministic.
    """
    m, _, d_sub = codebooks.shape

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((vmat.shape[0], m), dtype=np.int32)
            for sub in range(m):
                x = vmat[:, sub * d_sub : (sub + 1) * d_sub]
                codes[:, sub] = _sq_dists(x, codebooks[sub]).argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(dtype=np.int64), "codes": list(codes)}
            )

    return vectors.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(part, schema="vec_id long, codes array<int>")


def _collect_queries(queries, qid_col: str, qvec_col: str) -> list:
    """Query rows for LUT construction: a DataFrame is collected (the
    bounded serving set), anything else is taken as already-collected
    ``(qid, qvec)`` rows — r11 optimization: callers that materialized the
    query set anyway (e.g. 'the PQ_NQ smallest vec_ids') pass the rows
    straight through instead of round-tripping them through a local
    DataFrame whose ``collect()`` costs a few hundred ms of pure
    driver/py4j overhead per search call."""
    if isinstance(queries, DataFrame):
        return queries.select(qid_col, qvec_col).collect()
    return list(queries)


def adc_topk(
    queries,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation over PQ codes.

    Per query: an M×K lookup table of exact subspace squared distances is
    built once; each row's approximate squared distance is the sum of M
    table lookups on its codes. Per-partition local top-k (numpy) then an
    exact global window — only Q·k·P rows shuffle, and the scan side reads
    the codes table only (M ints/row), never the raw vectors.

    ``queries``: a DataFrame, or already-collected ``(qid, qvec)`` rows
    (see :func:`_collect_queries`).

    Returns ``qid, vec_id, dist (double, rounded), rank`` — same shape as
    ``brute_force_topk`` so recall is directly comparable.
    """
    m, n_k, d_sub = codebooks.shape
    qrows = _collect_queries(queries, qid_col, qvec_col)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # Q × D
    # LUTs: Q × M × K exact subspace squared distances.
    luts = np.empty((qmat.shape[0], m, n_k), dtype=np.float64)
    for sub in range(m):
        qsub = qmat[:, sub * d_sub : (sub + 1) * d_sub]
        luts[:, sub, :] = _lut_sq_dists(qsub, codebooks[sub])

    # Flatten LUTs to (Q, M·K) so one fancy-index gathers every query's
    # subspace distances at once (the round-1 kernel looped queries serially
    # and full-sorted every batch — 26% of the whole headline bench).
    luts_flat = luts.reshape(qmat.shape[0], m * n_k)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = np.arange(m, dtype=np.int64) * n_k  # code j of sub s → s·K + j
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)  # B × M
            kk = min(k, cmat.shape[0])
            flat_codes = cmat + offs[None, :]  # B × M indices into M·K
            d2 = luts_flat[:, flat_codes].sum(axis=2)  # one gather: Q × B
            dists = np.round(np.sqrt(np.maximum(d2, 0.0)), ROUND)
            out_q, out_v, out_d = [], [], []
            for qi in range(qmat.shape[0]):
                sel = _topk_idx(dists[qi], vids, kk)
                out_q.append(np.full(len(sel), qids[qi]))
                out_v.append(vids[sel])
                out_d.append(dists[qi][sel])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "dist": np.concatenate(out_d),
                }
            )

    reduced = codes.select("vec_id", "codes").mapInPandas(
        part, schema="qid long, vec_id long, dist double"
    )
    return _rank_topk(reduced, k)


def ivf_pq_search(
    queries,
    coded_vectors: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    centroid_rows=None,
) -> DataFrame:
    """IVF-PQ: probe-pruned candidate generation + ADC ranking — the
    billion-scale ANN layout (FAISS ``IVFx,PQy``) as two joins.

    ``coded_vectors`` must carry ``(vec_id, codes, cluster_id)`` — i.e. the
    PQ-encoded table written ``partitionBy("cluster_id")`` so the probe join
    is file pruning at scale. Per 100 TB query cost: (nprobe/C)·N rows
    scanned × M byte-codes each — both factors independently tunable, no
    float vector touched.

    ``centroid_rows`` (the collected stored centroid table — the in-memory
    coarse quantizer every FAISS-style deployment holds) switches probe
    selection to the driver: the query rows are already collected here for
    the ADC LUTs, so the probes become a LocalTableScan instead of a
    crossJoin + window-exchange subplan that re-scans the query side
    (r11 optimization round; value-identical, see probe_pairs_local).
    """
    from stackai_vector_db_spark.operators.ivf import (
        local_probes_df,
        probe_clusters,
    )

    m, n_k, d_sub = codebooks.shape
    qrows = _collect_queries(queries, qid_col, qvec_col)
    qid_to_row = {int(r[0]): i for i, r in enumerate(qrows)}
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    luts = np.empty((qmat.shape[0], m, n_k), dtype=np.float64)
    for sub in range(m):
        qsub = qmat[:, sub * d_sub : (sub + 1) * d_sub]
        luts[:, sub, :] = _lut_sq_dists(qsub, codebooks[sub])

    from stackai_vector_db_spark.operators.ivf import MAX_LOCAL_PROBE_PAIRS

    if (
        centroid_rows is not None
        and len(qrows) * len(centroid_rows) <= MAX_LOCAL_PROBE_PAIRS
    ):
        probes = local_probes_df(
            coded_vectors.sparkSession, qrows, centroids, centroid_rows, nprobe
        )
    else:
        # No centroid rows, or a query set past the driver-side probe
        # budget (ivf.MAX_LOCAL_PROBE_PAIRS): select probes distributed.
        probes = probe_clusters(
            queries, centroids, nprobe, "euclidean", qid_col, qvec_col
        )
    cand = coded_vectors.join(F.broadcast(probes), "cluster_id").select(
        "qid", "vec_id", "codes"
    )

    # qid → LUT row translation table (qids are query-set-local and small).
    sorted_qids = np.sort(np.array(list(qid_to_row), dtype=np.int64))
    qid_to_lut = np.array([qid_to_row[int(q)] for q in sorted_qids], dtype=np.int64)
    luts_flat = luts.reshape(luts.shape[0], m * n_k)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = np.arange(m, dtype=np.int64) * n_k
        for pdf in batches:
            if pdf.empty:
                continue
            batch_qids = pdf["qid"].to_numpy(dtype=np.int64)
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)  # B × M
            flat_codes = cmat + offs[None, :]  # B × M indices into M·K
            # Per-qid segments via one single-key argsort (qids take at
            # most Q ≤ 8 distinct values per the query-side collect
            # contract), then per-segment argpartition top-k (_topk_idx,
            # O(segment)). Replaces the old whole-batch 3-key
            # lexsort((vids, dists, qids)) — O(B log B) with three key
            # passes — which dominated this kernel's profile.
            order_q = np.argsort(batch_qids, kind="stable")
            q_sorted = batch_qids[order_q]
            starts = np.flatnonzero(np.r_[True, q_sorted[1:] != q_sorted[:-1]])
            ends = np.r_[starts[1:], len(q_sorted)]
            out_q, out_v, out_d = [], [], []
            for s, e in zip(starts, ends):
                seg = order_q[s:e]
                lut = luts_flat[
                    qid_to_lut[np.searchsorted(sorted_qids, q_sorted[s])]
                ]
                d2 = lut[flat_codes[seg]].sum(axis=1)
                dists = np.round(np.sqrt(np.maximum(d2, 0.0)), ROUND)
                seg_vids = vids[seg]
                sel = _topk_idx(dists, seg_vids, min(k, e - s))
                out_q.append(np.full(len(sel), q_sorted[s], dtype=np.int64))
                out_v.append(seg_vids[sel])
                out_d.append(dists[sel])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "dist": np.concatenate(out_d),
                }
            )

    reduced = cand.mapInPandas(part, schema="qid long, vec_id long, dist double")
    return _rank_topk(reduced, k)


def ivf_pq_residual_build(
    vectors: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    n_codes: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, DataFrame]:
    """Residual IVF-PQ build (the FAISS ``IVFx,PQy`` / IVFADC layout,
    Jégou et al. 2011 §IV): PQ trains and encodes ``vector − assigned
    coarse centroid`` rather than the raw vector. Residuals concentrate
    around the origin with far less variance than raw vectors, so the same
    M×K code budget quantizes them with lower error → higher recall at
    identical storage and query cost.

    Returns ``(codebooks, coded)`` where ``coded`` is
    ``(vec_id, codes, cluster_id)`` — the same shape ``ivf_pq_search``'s
    ``coded_vectors`` takes, written ``partitionBy("cluster_id")`` at
    scale. The residual subtraction is a JVM ``zip_with``; only the
    bounded train sample is ever collected.

    Honest measurement note: the gain is proportional to how much variance
    the coarse clusters capture. On real embedding corpora that is a lot
    (FAISS defaults to IVFADC for this reason); on this repo's synthetic
    fixture the within-cluster variance ≈ total variance and residual
    measures ~par with raw PQ (tests assert exactness properties and a
    parity envelope, not superiority)."""
    from stackai_vector_db_spark.operators.ivf import assign_clusters

    # The (vec_id, cluster_id) assignment is the stored IVF layout — tiny
    # rows (two longs), persisted so the residual branch and the final
    # codes join read one computation.
    assigned = assign_clusters(
        vectors, centroids, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cluster_id").persist()
    assigned.count()
    try:
        resid = (
            vectors.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
            .join(assigned, id_col)
            .join(F.broadcast(centroids), "cluster_id")
            .select(
                id_col,
                "cluster_id",
                F.zip_with("__v", "centroid", lambda a, b: a - b).alias("__r"),
            )
        )
        codebooks = train_pq(
            resid, m=m, n_codes=n_codes, seed=seed, id_col=id_col, vec_col="__r"
        )
        coded = encode_pq(resid, codebooks, id_col=id_col, vec_col="__r").join(
            assigned, id_col
        )
        coded = coded.localCheckpoint(eager=True)
    finally:
        assigned.unpersist(blocking=False)
    return codebooks, coded


def ivf_pq_residual_search(
    queries,
    coded_vectors: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    centroid_rows=None,
) -> DataFrame:
    """Search the residual IVF-PQ layout: per probed (query, cluster) pair
    the ADC lookup table is built over ``qvec − centroid`` (the query's
    residual in that cluster's frame), then candidates rank exactly like
    ``ivf_pq_search``. LUT cost is Q·nprobe·M·K doubles — driver-side and
    tiny by the same bounded-collect contract as the raw path (queries
    ≤ a handful per request; centroids are the stored coarse table).

    Probe selection always ran on collected inputs here (the per-pair LUTs
    need both maps anyway); r11 computes the pairs driver-side
    (probe_pairs_local — value-identical) instead of planning, executing
    AND collecting a crossJoin + window subplan per call, and enters them
    into the candidate join as a LocalTableScan. ``centroid_rows`` lets the
    caller hand over the already-loaded coarse table; None collects it."""
    from stackai_vector_db_spark.operators.ivf import (
        local_probes_df,
        probe_pairs_local,
    )

    m, n_k, d_sub = codebooks.shape
    qrows = _collect_queries(queries, qid_col, qvec_col)
    qvec_map = {int(r[0]): np.array(r[1], dtype=np.float64) for r in qrows}
    if centroid_rows is None:
        centroid_rows = centroids.collect()
    cent_map = {
        int(r["cluster_id"]): np.array(r["centroid"], dtype=np.float64)
        for r in centroid_rows
    }
    probe_pairs = [
        (int(q), int(c))
        for q, c in probe_pairs_local(qrows, centroid_rows, nprobe)
    ]
    luts: dict[tuple[int, int], np.ndarray] = {}
    for qid, cid in probe_pairs:
        rq = qvec_map[qid] - cent_map[cid]
        lut = np.empty((m, n_k), dtype=np.float64)
        for sub in range(m):
            lut[sub] = _lut_sq_dists(
                rq[sub * d_sub : (sub + 1) * d_sub][None, :], codebooks[sub]
            )[0]
        luts[(qid, cid)] = lut.ravel()

    probes = local_probes_df(
        coded_vectors.sparkSession, qrows, centroids, centroid_rows, nprobe,
        pairs=probe_pairs,
    )
    cand = coded_vectors.join(F.broadcast(probes), "cluster_id").select(
        "qid", "vec_id", "codes", "cluster_id"
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = np.arange(m, dtype=np.int64) * n_k
        for pdf in batches:
            if pdf.empty:
                continue
            batch_qids = pdf["qid"].to_numpy(dtype=np.int64)
            batch_cids = pdf["cluster_id"].to_numpy(dtype=np.int64)
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            flat_codes = np.array(list(pdf["codes"]), dtype=np.int64) + offs[None, :]
            # Pass 1: distances via per-(qid, cluster) segment LUT gathers.
            combo = batch_qids * (batch_cids.max() + 1) + batch_cids
            order_c = np.argsort(combo, kind="stable")
            c_sorted = combo[order_c]
            seg_starts = np.flatnonzero(np.r_[True, c_sorted[1:] != c_sorted[:-1]])
            seg_ends = np.r_[seg_starts[1:], len(c_sorted)]
            d2 = np.empty(len(pdf), dtype=np.float64)
            for s, e in zip(seg_starts, seg_ends):
                seg = order_c[s:e]
                lut = luts[(int(batch_qids[seg[0]]), int(batch_cids[seg[0]]))]
                d2[seg] = lut[flat_codes[seg]].sum(axis=1)
            dists = np.round(np.sqrt(np.maximum(d2, 0.0)), ROUND)
            # Pass 2: per-qid local top-k across that query's probed clusters.
            order_q = np.argsort(batch_qids, kind="stable")
            q_sorted = batch_qids[order_q]
            starts = np.flatnonzero(np.r_[True, q_sorted[1:] != q_sorted[:-1]])
            ends = np.r_[starts[1:], len(q_sorted)]
            out_q, out_v, out_d = [], [], []
            for s, e in zip(starts, ends):
                seg = order_q[s:e]
                seg_vids = vids[seg]
                seg_d = dists[seg]
                sel = _topk_idx(seg_d, seg_vids, min(k, e - s))
                out_q.append(np.full(len(sel), q_sorted[s], dtype=np.int64))
                out_v.append(seg_vids[sel])
                out_d.append(seg_d[sel])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "dist": np.concatenate(out_d),
                }
            )

    reduced = cand.mapInPandas(part, schema="qid long, vec_id long, dist double")
    return _rank_topk(reduced, k)


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Fraction of exact top-k ids recovered by the approximate top-k."""
    hits = approx.filter(F.col("rank") <= k).select("qid", "vec_id")
    truth = exact.filter(F.col("rank") <= k).select("qid", "vec_id")
    n_truth = truth.count()
    if n_truth == 0:
        return 1.0
    n_hit = truth.join(hits, ["qid", "vec_id"], "inner").count()
    return n_hit / n_truth
