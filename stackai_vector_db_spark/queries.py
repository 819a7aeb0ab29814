"""Query registry: every operator from SURVEY.md §2 as a (Spark query,
DuckDB oracle SQL) pair, keyed by query id.

The driver runs each Spark query at sf0.01 and hash-compares row counts,
schema, and values (columns sorted by name) against the oracle SQL executed
by DuckDB over the same parquet tables. Determinism rules used throughout
(SURVEY.md §7.3):

- float math accumulates in DOUBLE and outputs are ``round(·, 6)`` (or a
  stated coarser rounding for aggregates of large sums);
- rankings order by (rounded dist, id) so ties break identically;
- no timestamps in outputs — epoch millis BIGINT instead;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.functions.vector import (
    add_fake_embedding,
    cosine_distance,
    euclidean_distance,
    fake_embedding,
)
from stackai_vector_db_spark.operators import knn as knn_ops
from stackai_vector_db_spark.operators import ivf as ivf_ops


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


# DuckDB SQL fragment: exact double euclidean distance between two FLOAT
# lists, rounded — mirrors functions.vector.euclidean_distance.
def _dk_euclid(a: str, b: str) -> str:
    return (
        f"round(sqrt(list_sum(list_transform(range(1, len({a})+1), "
        f"i -> power({a}[i]::DOUBLE - {b}[i]::DOUBLE, 2)))), 6)"
    )


def _dk_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _dk_cosine(a: str, b: str) -> str:
    return (
        f"round(CASE WHEN sqrt({_dk_dot(a, a)}) * sqrt({_dk_dot(b, b)}) = 0 THEN 1.0 "
        f"ELSE 1.0 - {_dk_dot(a, b)} / (sqrt({_dk_dot(a, a)}) * sqrt({_dk_dot(b, b)})) END, 6)"
    )


# ---------------------------------------------------------------------------
# F1/F2 — distance scalar functions (reference app/indexes/base.py:207-221)
# ---------------------------------------------------------------------------

@register(
    "q_fn_euclidean",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_dk_euclid('a.embedding', 'b.embedding')} AS dist
    FROM embeddings a, embeddings b
    WHERE a.vec_id < 10 AND b.vec_id < 10 AND a.vec_id < b.vec_id
    """,
)
def q_fn_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(euclidean_distance("va", "vb"), 6).alias("dist"),
        )
    )


@register(
    "q_fn_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_dk_cosine('a.embedding', 'b.embedding')} AS dist
    FROM embeddings a, embeddings b
    WHERE a.vec_id < 10 AND b.vec_id < 10 AND a.vec_id < b.vec_id
    """,
)
def q_fn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_distance("va", "vb"), 6).alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# J2 + A1 + O1/O2 — brute-force kNN, the flagship (linear.py:45-61)
# ---------------------------------------------------------------------------

KNN_NQ = 8  # query set: vec_id < 8
KNN_K = 10


def _knn_queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


@register(
    "q_knn_brute_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
    scored AS (
      SELECT q.qid, v.vec_id,
             {_dk_euclid('q.qvec', 'v.embedding')} AS dist
      FROM q, embeddings v),
    ranked AS (
      SELECT qid, vec_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
      FROM scored)
    SELECT qid, vec_id, dist, rnk::INTEGER AS rnk FROM ranked WHERE rnk <= {KNN_K}
    """,
)
def q_knn_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: Arrow-batched per-partition pre-reduction, then exact
    global top-k (shuffle Q·k·P rows instead of Q·N)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_ops.brute_force_topk(
        _knn_queries(emb), emb, KNN_K, metric="euclidean", strategy="prereduce"
    )
    return out.withColumnRenamed("rank", "rnk")


@register(
    "q_knn_window_rank",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {KNN_NQ}),
    scored AS (
      SELECT q.qid, v.vec_id,
             {_dk_cosine('q.qvec', 'v.embedding')} AS dist
      FROM q, embeddings v),
    ranked AS (
      SELECT qid, vec_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
      FROM scored)
    SELECT qid, vec_id, dist, rnk::INTEGER AS rnk FROM ranked WHERE rnk <= 5
    """,
)
def q_knn_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative window form (W1), cosine metric — the correctness
    baseline plan: crossJoin(broadcast) + row_number window."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_ops.brute_force_topk(
        _knn_queries(emb), emb, 5, metric="cosine", strategy="window"
    )
    return out.withColumnRenamed("rank", "rnk")


# ---------------------------------------------------------------------------
# F3 — deterministic fake embedding (app/clients/embedding.py:95-127)
# ---------------------------------------------------------------------------

FAKE_DIM = 8

_DK_CLEAN = "lower(trim(text))"
_DK_CS = (
    f"list_sum(list_transform(range(1, length({_DK_CLEAN})+1), "
    f"i -> ord(substr({_DK_CLEAN}, i, 1))))"
)
_DK_WORDS = (
    f"CASE WHEN length({_DK_CLEAN}) = 0 THEN 0 "
    f"ELSE len(regexp_split_to_array({_DK_CLEAN}, '\\s+')) END"
)


@register(
    "q_fake_embed",
    oracle=f"""
    WITH props AS (
      SELECT doc_id,
             {_DK_CS}::BIGINT AS cs,
             length({_DK_CLEAN})::BIGINT AS n_len,
             {_DK_WORDS}::BIGINT AS n_words
      FROM documents),
    comps AS (
      SELECT doc_id, cs, n_len, n_words,
             list_transform(range(0, {FAKE_DIM}),
               i -> ((cs*(i+1) + n_len*(i+7) + n_words*(i+13)) % 1000)::DOUBLE / 1000.0 - 0.5
             ) AS emb
      FROM props)
    SELECT doc_id, cs, n_len, n_words,
           round(emb[1], 6) AS c0,
           round(emb[{FAKE_DIM}], 6) AS c_last,
           round(list_sum(emb), 6) AS emb_sum
    FROM comps
    """,
)
def q_fake_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from stackai_vector_db_spark.functions.text import char_sum, token_count_ws

    clean = F.lower(F.trim(F.col("text")))
    emb = fake_embedding(F.col("text"), FAKE_DIM)
    return docs.select(
        "doc_id",
        char_sum(clean).alias("cs"),
        F.length(clean).cast("long").alias("n_len"),
        token_count_ws(clean).cast("long").alias("n_words"),
        F.round(emb[0], 6).alias("c0"),
        F.round(emb[FAKE_DIM - 1], 6).alias("c_last"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("emb_sum"),
    )


# ---------------------------------------------------------------------------
# A9 — dimension-consistency check (base.py:107-123, index_service.py:426-428)
# ---------------------------------------------------------------------------

@register(
    "q_dim_check",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           count(DISTINCT len(embedding))::BIGINT AS n_dims,
           min(len(embedding))::BIGINT AS dim_min,
           max(len(embedding))::BIGINT AS dim_max
    FROM embeddings
    """,
)
def q_dim_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.size("embedding")).alias("n_dims"),
        F.min(F.size("embedding")).cast("long").alias("dim_min"),
        F.max(F.size("embedding")).cast("long").alias("dim_max"),
    )


# ---------------------------------------------------------------------------
# Flagship end-to-end: text → fake-embed → kNN → hydrate join
# (reference trace SURVEY.md §3.1 steps 3-8: search_service.py:67-224)
# ---------------------------------------------------------------------------

E2E_DIM = 16
E2E_K = 5
E2E_NQ = 3

_DK_EMB_E2E = (
    f"list_transform(range(0, {E2E_DIM}), "
    f"i -> (({_DK_CS}*(i+1) + length({_DK_CLEAN})*(i+7) + {_DK_WORDS}*(i+13)) % 1000)::DOUBLE"
    f" / 1000.0 - 0.5)"
)


@register(
    "q_embed_knn_e2e",
    oracle=f"""
    WITH embdocs AS (
      SELECT doc_id, lang, source, {_DK_EMB_E2E} AS emb FROM documents),
    q AS (SELECT doc_id AS qid, emb AS qvec FROM embdocs WHERE doc_id < {E2E_NQ}),
    scored AS (
      SELECT q.qid, d.doc_id,
             round(sqrt(list_sum(list_transform(range(1, {E2E_DIM}+1),
               i -> power(q.qvec[i] - d.emb[i], 2)))), 6) AS dist
      FROM q, embdocs d),
    ranked AS (
      SELECT qid, doc_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, doc_id) AS rnk
      FROM scored)
    SELECT r.qid, r.doc_id, r.dist, r.rnk::INTEGER AS rnk, d.lang, d.source
    FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
    WHERE r.rnk <= {E2E_K}
    """,
)
def q_embed_knn_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's text-search lifecycle as ONE DataFrame plan:
    embed (F3) → crossJoin+distance (J2) → top-k window (A1/W1) →
    hydrate join back to documents (J1, broadcast of the tiny hit set)."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize embeddings once (persist) — otherwise Catalyst's projection
    # collapse inlines the embed expression into the distance computation and
    # recomputes it per crossJoin pair. Mirrors the reference's design where
    # embeddings are stored on chunks, not recomputed per query
    # (index_service.py:436-500).
    # Repartition before the O(len(text)) embed: the fixture is one parquet
    # file → one input partition; spreading across cores first parallelizes
    # the per-char aggregate (at 100 TB the source is already thousands of
    # files and this becomes a no-op choice).
    par = spark.sparkContext.defaultParallelism
    embdocs = (
        add_fake_embedding(docs.repartition(par), "text", E2E_DIM, "emb")
        .select("doc_id", "lang", "source", "emb")
        .persist()
    )
    q = embdocs.filter(F.col("doc_id") < E2E_NQ).select(
        F.col("doc_id").alias("qid"), F.col("emb").alias("qvec")
    )
    hits = knn_ops.brute_force_topk(
        q, embdocs, E2E_K, metric="euclidean", strategy="window",
        id_col="doc_id", vec_col="emb",
    ).withColumnRenamed("rank", "rnk")
    return (
        F.broadcast(hits.withColumnRenamed("vec_id", "doc_id"))
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("qid", "doc_id", "dist", "rnk", "lang", "source")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
