"""Run one registered query: rows, timing, and the physical-plan audit.

Usage:
    python tools/run_query.py q_knn_brute_topk [sf_dir] [--show N] [--explain]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackai_vector_db_spark.queries import REGISTRY  # noqa: E402
from stackai_vector_db_spark.session import get_spark  # noqa: E402
from tools.explain_audit import audit  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if not args or args[0] not in REGISTRY:
        known = ", ".join(sorted(REGISTRY))
        sys.exit(f"usage: run_query.py <query> [sf_dir]\nknown: {known}")
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    show = 10
    for a in flags:
        if a.startswith("--show"):
            show = int(a.split("=", 1)[1]) if "=" in a else 10

    spark = get_spark(app_name=f"run-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{name}: {n} rows in {dt:.3f}s @ {sf_dir}")
    print("plan:", audit(df))
    if "--explain" in flags:
        df.explain("formatted")
    df.show(show, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
