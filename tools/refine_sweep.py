"""Refine-recall sweep: shortlist depth × probe strategy on the clustered
probe geometry, to pick the depth at which IVFADC+refine clears a real
recall floor (the r4 verdict measured 0.79 at depth 100 and asked for the
knee of the depth/recall/cost curve).

Two first stages feed the same exact refine (`rerank_exact`):

- ``adc``   — full-corpus ADC scan, shortlist = top-``depth`` by ADC dist.
- ``ivfpq`` — probe-pruned IVF-PQ (codes joined to cluster ids), shortlist
  = top-``depth`` within ``nprobe`` probed clusters.

Reference contract being bounded: IVF recall tolerance (README.md:322-330
of the reference allows approximate recall for probed search); the refine
stage is our extension that buys back exactness of ORDER, so the only
residual error is shortlist membership — which this sweep sizes.

Usage: python tools/refine_sweep.py [n_vectors] [dim]
Prints one JSON line per (stage, depth, nprobe) configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stackai_vector_db_spark.session import get_spark  # noqa: E402
from stackai_vector_db_spark.operators.knn import (  # noqa: E402
    brute_force_topk,
    rerank_exact,
)
from stackai_vector_db_spark.operators.ivf import (  # noqa: E402
    assign_clusters,
    label_mean_centroids,
)
from stackai_vector_db_spark.operators.pq import (  # noqa: E402
    adc_topk,
    encode_pq,
    ivf_pq_search,
    train_pq,
)
from tools.scale_probe import synth_vectors  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k, nq = 10, 8

    spark = get_spark(app_name="refine-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    vecs = synth_vectors(spark, n, dim, par, mode="clustered").persist()
    vecs.count()
    spark.range(64).mapInPandas(lambda it: it, schema="id long").count()

    q = vecs.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact_df = brute_force_topk(q, vecs, k, strategy="prereduce")
    exact = {(r["qid"], r["vec_id"]) for r in exact_df.collect()}

    def recall(df) -> float:
        got = {(r["qid"], r["vec_id"]) for r in df.select("qid", "vec_id").collect()}
        return round(len(got & exact) / len(exact), 4)

    cb = train_pq(vecs, m=8, n_codes=256, seed=42, sample_cap=50_000)
    codes = encode_pq(vecs, cb).persist()
    codes.count()

    cents = label_mean_centroids(vecs).persist()
    cents.count()
    coded = codes.join(
        assign_clusters(vecs, cents).select("vec_id", "cluster_id"), "vec_id"
    ).persist()
    coded.count()

    for depth in (100, 200, 400, 800):
        t0 = time.perf_counter()
        short = adc_topk(q, codes, cb, k=depth)
        refined = rerank_exact(short, vecs, q, k)
        r = recall(refined)
        print(
            json.dumps(
                {
                    "stage": "adc+refine",
                    "n": n,
                    "depth": depth,
                    "nprobe": None,
                    "recall_at_10": r,
                    "sec": round(time.perf_counter() - t0, 3),
                }
            ),
            flush=True,
        )

    for nprobe in (2, 4, 8):
        for depth in (100, 200, 400):
            t0 = time.perf_counter()
            short = ivf_pq_search(q, coded, cents, cb, k=depth, nprobe=nprobe)
            refined = rerank_exact(short, vecs, q, k)
            r = recall(refined)
            print(
                json.dumps(
                    {
                        "stage": "ivfpq+refine",
                        "n": n,
                        "depth": depth,
                        "nprobe": nprobe,
                        "recall_at_10": r,
                        "sec": round(time.perf_counter() - t0, 3),
                    }
                ),
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
