"""Versioned vector store: the reference's service lifecycle on Parquet.

Maps the reference's in-memory machinery to immutable-table conventions
(SURVEY.md §3.1-3.3, §4.1):

- ``IndexSnapshot`` + atomic swap (``index_service.py:34-52``, ``270-283``)
  → versioned directory per build (``chunks/vN``, ``index/vN``) plus an
  atomically-replaced pointer file. Readers resolve the pointer once and
  then only touch immutable files — the snapshot-isolation the reference
  gets from RWLocks falls out of storage immutability, zero locking.
- per-library RWLock (``utils/rwlock.py``) → single-writer job discipline;
  readers never block.
- tombstone deletes (``base.py:196-206``) → anti-join compaction into the
  next version (no positional coupling: ids are columns).
- dirty counters + rebuild threshold (``index_service.py:88-97``,
  ``163-196``) → a tiny control parquet with (library_id, dirty_count).
- lazy embedding backfill (``index_service.py:436-500``) → fake-embed rows
  with empty embeddings at build time.
- IVF inverted lists (``ivf.py:54-130``) → KMeans centroids +
  ``partitionBy("cluster_id")`` layout; probe filters prune directories.

The store is the serving-side composition of the operators in
``operators/``; every step is a plain DataFrame job that would run
unchanged on a multi-node cluster.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from stackai_vector_db_spark.functions.vector import fake_embedding
from stackai_vector_db_spark.operators.ivf import (
    assign_clusters,
    kmeans_centroids,
    probe_clusters,
)
from stackai_vector_db_spark.operators.knn import brute_force_topk

CHUNK_SCHEMA = (
    "chunk_id long, document_id long, library_id long, text string, "
    "embedding array<float>, start_index int, end_index int"
)

DEFAULT_DIM = 16
REBUILD_THRESHOLD = 0.1  # reference config.py:58


class VectorStore:
    """Chunks and index carry independent versions behind one pointer file:
    ``{"chunks": N, "index": M}`` — ingest/delete bump ``chunks``, builds
    bump ``index``. Any reader holding (N, M) sees a stable snapshot."""

    def __init__(self, spark: SparkSession, root: str, dim: int = DEFAULT_DIM):
        self.spark = spark
        self.root = root
        self.dim = dim
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)

    # ---- version pointer (snapshot swap) ---------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_meta", "CURRENT")

    def versions(self) -> dict:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"chunks": 0, "index": 0}

    def _swap_pointer(self, **updates: int) -> None:
        """Atomic pointer swap (write-temp + os.replace) — the
        IndexSnapshot version bump of index_service.py:270-283."""
        payload = {**self.versions(), **updates}
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_meta"))
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._pointer_path())

    def _chunks_path(self, version: int) -> str:
        return os.path.join(self.root, "chunks", f"v{version}")

    def _index_path(self, version: int) -> str:
        return os.path.join(self.root, "index", f"v{version}")

    # ---- ingest (trace §3.3) ---------------------------------------------

    def ingest_chunks(self, rows: DataFrame, compute_embedding: bool = True) -> int:
        """Validate (P7), default end_index (F6), optionally eager-embed
        (F3), write the next chunks version, bump dirty counters."""
        validated = (
            rows.filter(F.length(F.trim(F.col("text"))) > 0)
            .withColumn(
                "end_index",
                F.coalesce(
                    F.col("end_index"),
                    F.col("start_index") + F.length(F.trim(F.col("text"))),
                ).cast("int"),
            )
            .withColumn(
                "embedding",
                F.coalesce(F.col("embedding"), F.array().cast("array<float>")),
            )
        )
        if compute_embedding:
            validated = validated.withColumn(
                "embedding",
                F.when(F.size("embedding") > 0, F.col("embedding")).otherwise(
                    fake_embedding(F.col("text"), self.dim).cast("array<float>")
                ),
            )
        v = self.versions()["chunks"]
        prev = self.read_chunks()
        combined = (
            prev.unionByName(validated.select(*prev.columns))
            if prev is not None
            else validated
        )
        combined.write.mode("overwrite").partitionBy("library_id").parquet(
            self._chunks_path(v + 1)
        )
        self._swap_pointer(chunks=v + 1)
        self._bump_dirty(validated)
        return v + 1

    def read_chunks(self, version: int | None = None) -> DataFrame | None:
        v = self.versions()["chunks"] if version is None else version
        path = self._chunks_path(v)
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    # ---- cascade delete (J4, trace library_service.py:67-77) -------------

    def delete_documents(self, doc_ids: DataFrame) -> int:
        """Anti-join compaction into a new chunks version (tombstone-free)."""
        cur = self.read_chunks()
        if cur is None:
            raise ValueError("empty store")
        survivors = cur.join(
            doc_ids.select(F.col("document_id")), "document_id", "left_anti"
        )
        v = self.versions()["chunks"] + 1
        survivors.write.mode("overwrite").partitionBy("library_id").parquet(
            self._chunks_path(v)
        )
        self._swap_pointer(chunks=v)
        return v

    # ---- dirty control table (A7) ----------------------------------------

    def _dirty_path(self) -> str:
        return os.path.join(self.root, "control", "dirty")

    def _write_dirty(self, df: DataFrame) -> None:
        # tiny control table → stage then rewrite, single file
        tmp_path = self._dirty_path() + "_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp_path)
        staged = self.spark.read.parquet(tmp_path)
        staged.coalesce(1).write.mode("overwrite").parquet(self._dirty_path())

    def _bump_dirty(self, new_rows: DataFrame) -> None:
        inc = new_rows.groupBy("library_id").agg(F.count(F.lit(1)).alias("dirty_count"))
        if os.path.exists(self._dirty_path()):
            prev = self.spark.read.parquet(self._dirty_path())
            inc = (
                prev.unionByName(inc)
                .groupBy("library_id")
                .agg(F.sum("dirty_count").alias("dirty_count"))
            )
        self._write_dirty(inc)

    def dirty_count(self, library_id: int) -> int:
        if not os.path.exists(self._dirty_path()):
            return 0
        row = (
            self.spark.read.parquet(self._dirty_path())
            .filter(F.col("library_id") == library_id)
            .collect()
        )
        return row[0]["dirty_count"] if row else 0

    def needs_rebuild(self, library_id: int) -> bool:
        """dirty_count / total >= 0.1 (index_service.py:88-97)."""
        cur = self.read_chunks()
        total = (
            cur.filter(F.col("library_id") == library_id).count()
            if cur is not None
            else 0
        )
        return self.dirty_count(library_id) / max(total, 1) >= REBUILD_THRESHOLD

    def _reset_dirty(self, library_id: int) -> None:
        if not os.path.exists(self._dirty_path()):
            return
        self._write_dirty(
            self.spark.read.parquet(self._dirty_path()).filter(
                F.col("library_id") != library_id
            )
        )

    # ---- index build (trace §3.2) ----------------------------------------

    def build_index(self, library_id: int, n_clusters: int = 8) -> int:
        """Backfill embeddings, KMeans centroids, cluster-partitioned write,
        pointer swap, dirty reset — the full build trace as one batch job."""
        cur = self.read_chunks()
        if cur is None:
            raise ValueError("empty store")
        lib = cur.filter(F.col("library_id") == library_id)
        if lib.isEmpty():
            raise ValueError(f"library {library_id} is empty")  # EmptyLibraryError
        lib = lib.withColumn(
            "embedding",
            F.when(F.size("embedding") > 0, F.col("embedding")).otherwise(
                fake_embedding(F.col("text"), self.dim).cast("array<float>")
            ),
        )
        vectors = lib.select(F.col("chunk_id").alias("vec_id"), "embedding")
        cents = kmeans_centroids(vectors, n_clusters=n_clusters)
        assigned = assign_clusters(vectors, cents)
        new_v = self.versions()["index"] + 1
        (
            lib.join(
                assigned.select(F.col("vec_id").alias("chunk_id"), "cluster_id"),
                "chunk_id",
            )
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(self._index_path(new_v))
        )
        cents.write.mode("overwrite").parquet(
            os.path.join(self._index_path(new_v), "_centroids")
        )
        self._swap_pointer(index=new_v)
        self._reset_dirty(library_id)
        return new_v

    def read_index(self, version: int | None = None) -> tuple[DataFrame, DataFrame]:
        v = self.versions()["index"] if version is None else version
        path = self._index_path(v)
        chunks = self.spark.read.parquet(path)
        cents = self.spark.read.parquet(os.path.join(path, "_centroids"))
        return chunks, cents

    # ---- search (trace §3.1) ---------------------------------------------

    def search_text(
        self,
        library_id: int,
        text: str,
        k: int = 10,
        nprobe: int = 2,
        version: int | None = None,
    ) -> DataFrame:
        """Embed query text (F3), probe clusters (O5), top-k within probed
        partitions (J2+A1), hydrate chunk payload (J1). Passing ``version``
        pins a snapshot (reads are stable while a new build runs)."""
        q = self.spark.createDataFrame([(0, text)], "qid long, qtext string").select(
            "qid",
            fake_embedding(F.col("qtext"), self.dim).cast("array<float>").alias("qvec"),
        )
        idx, cents = self.read_index(version)
        probes = probe_clusters(q, cents, nprobe)
        cand = idx.join(
            F.broadcast(probes.select("cluster_id").distinct()), "cluster_id"
        )
        hits = brute_force_topk(
            q, cand, k, id_col="chunk_id", vec_col="embedding"
        ).withColumnRenamed("vec_id", "chunk_id")
        return (
            F.broadcast(hits)
            .join(
                idx.select("chunk_id", "document_id", "library_id", "text"), "chunk_id"
            )
            .select("qid", "chunk_id", "document_id", "dist", "rank", "text")
        )
