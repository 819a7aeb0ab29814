"""Random-hyperplane LSH for approximate nearest neighbors (cosine family).

The second scale path next to IVF (operators/ivf.py): instead of learned
centroids, ``n_planes`` fixed hyperplanes hash each vector to a sign-bit
bucket; near-angular vectors collide with high probability. Search probes
the query's bucket plus all hamming-1 neighbors (multi-probe), then runs
the exact top-k inside the candidate set — the same
candidate-generation/verification split as MinHash-LSH dedup.

At scale the bucket id is a partition column (``partitionBy("bucket")``
write → probe filters prune files), and the bucket computation is a pure
JVM expression over literal hyperplane arrays — no model object, no Python.

Determinism contract: hyperplane components come from a fixed integer
formula (below), dots are rounded to 9 before the sign test, distances to 6
before ranking — so Spark and the DuckDB oracle build identical buckets and
identical rankings. The reference has no LSH (its ANN is IVF only,
``app/indexes/ivf.py``); this operator follows the standard
random-hyperplane construction (Charikar's SimHash family) re-expressed
declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from stackai_vector_db_spark.functions.memo import memoized_expr
from stackai_vector_db_spark.operators.knn import ROUND

# Hyperplane component (p = plane index, d = dimension index):
#   ((p·31 + d) · 2654435761 mod 1000) / 1000 − 0.5
# 2654435761 is the Knuth multiplicative-hash constant; all math stays in
# exact integers until the final division, so any engine reproduces it.
_MIX = 2654435761


def plane(p: int, dim: int) -> list[float]:
    return [(((p * 31 + d) * _MIX) % 1000) / 1000.0 - 0.5 for d in range(dim)]


def _dot(vec: Column, h: Column) -> Column:
    return F.round(
        F.aggregate(
            F.zip_with(vec, h, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )


@memoized_expr
def bucket_col(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign-bit bucket id in [0, 2^n_planes).

    The hyperplane matrix enters the plan as ONE array<array<double>>
    literal and the sign bits fold through a single transform/aggregate
    chain — building one literal per component (n_planes·dim of them) costs
    seconds of py4j/analysis time per query before any data is read."""
    planes = F.array(*[F.lit(plane(p, dim)) for p in range(n_planes)])
    bits = F.transform(
        planes,
        lambda h, p: F.when(
            _dot(vec, h) >= 0,
            F.pow(F.lit(2.0), p.cast("double")).cast("long"),  # exact ≤ 2^52
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def probe_buckets_col(bucket: Column, n_planes: int) -> Column:
    """The query's bucket plus every hamming-1 neighbor (flip one plane's
    bit) — standard multi-probe LSH.

    The bucket expression is bound once per row via a 1-element ``transform``
    lambda before fan-out: referencing it directly in all n_planes+1 array
    slots would inline the full n_planes×dim dot-product tree into each slot
    (Catalyst CollapseProject), blowing up codegen size and compile time
    ~(n_planes+1)×."""
    def fan(b: Column) -> Column:
        return F.array(b, *[b.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])

    return F.element_at(F.transform(F.array(bucket), fan), 1)


def ann_lsh_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 6,
    metric_col=None,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = vectors whose bucket is within
    hamming-1 of the query's bucket; exact rounded-distance ranking within.
    ``metric_col(a, b)`` defaults to cosine — the metric the
    random-hyperplane family actually preserves (collision probability =
    1 − θ/π); pass euclidean only when vectors are norm-comparable.

    Stored-layout reuse: a vectors side that already carries "bucket" (and
    optionally "__vnorm") is the write-time layout — the probe join prunes
    its files and nothing is rehashed. A QUERIES side that carries "bucket"
    skips the query-time rehash too (the reference pattern: queries drawn
    from the indexed corpus, as in kNN-graph builds). When the default
    cosine metric runs against a prenormed vectors side, the self-norms are
    hoisted out of the candidate loop (cosine_distance_prenormed — value-
    identical operation order, so the oracle contract is unchanged)."""
    from stackai_vector_db_spark.functions.vector import (
        cosine_distance,
        cosine_distance_prenormed,
        vector_norm,
    )

    # A vectors side that already carries "bucket" is the stored layout
    # (written partitionBy("bucket") at ingest — the probe join then prunes
    # files); otherwise hash inline.
    if "bucket" in vectors.columns:
        bucketed = vectors
    else:
        bucketed = vectors.withColumn(
            "bucket", bucket_col(F.col(vec_col), n_planes, dim)
        )
    prenormed = metric_col is None and "__vnorm" in bucketed.columns
    if metric_col is None:
        metric_col = cosine_distance

    if "bucket" in queries.columns:
        qsel = queries.select(
            F.col(qid_col).alias("qid"),
            F.col(qvec_col).alias("qvec"),
            F.col("bucket").alias("__qbucket"),
        )
    else:
        # Two chained projections, not one select: aliasing qvec and
        # referencing it in the same select list trips Spark 4.1's
        # single-pass resolver ("Resolved plan should not contain any
        # LateralColumnAliasReference").
        qsel = queries.select(
            F.col(qid_col).alias("qid"), F.col(qvec_col).alias("qvec")
        ).withColumn("__qbucket", bucket_col(F.col("qvec"), n_planes, dim))
    if prenormed:
        qsel = qsel.withColumn("__qnorm", vector_norm(F.col("qvec")))
    probes = qsel.withColumn(
        "bucket", F.explode(probe_buckets_col(F.col("__qbucket"), n_planes))
    ).drop("__qbucket")
    dist = (
        cosine_distance_prenormed(
            F.col("qvec"), F.col(vec_col), F.col("__qnorm"), F.col("__vnorm")
        )
        if prenormed
        else metric_col(F.col("qvec"), F.col(vec_col))
    )
    cand = bucketed.join(F.broadcast(probes), "bucket").select(
        "qid",
        F.col(id_col).alias("vec_id"),
        F.round(dist, ROUND).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "dist", "rank")
    )
