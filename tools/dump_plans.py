"""Dump .explain('formatted') for headline queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <outdir> <suffix> [query ...]
Defaults to the bench HEADLINE set when no queries are given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from stackai_vector_db_spark.queries import REGISTRY  # noqa: E402
from stackai_vector_db_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_knn_brute_topk",
    "q_knn_window_rank",
    "q_embed_knn_e2e",
    "q_fake_embed",
    "q_dim_check",
    "q_ivf_probe_topk",
    "q_join_smj",
    "q_agg_rollup",
    "q_dedup_minhash_lsh",
    "q_events_session",
    "q_window_frame",
    "q_ann_lsh_topk",
    "q_asof_join",
    "q_range_join",
    "q_pq_adc_topk",
    "q_ivf_pq_topk",
    "q_corpus_pipeline",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    from stackai_vector_db_spark import queries as Q

    Q._pq_artifacts(spark, sf_dir)
    Q._lsh_bucketed(spark, sf_dir)
    Q._ivf_pq_coded(spark, sf_dir)
    Q._shingle_base(spark, sf_dir)
    Q._lsh_banded(spark, sf_dir)
    Q._e2e_embdocs(spark, sf_dir)
    split = bench._split_docs_dir(spark, sf_dir)

    for name in names:
        qd = REGISTRY.get(name)
        if qd is None:
            continue
        q_sf = split if name == "q_corpus_pipeline" else sf_dir
        df = qd.fn(spark, q_sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
