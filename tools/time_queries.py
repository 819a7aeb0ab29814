"""Time each registered query's Spark-side execution at a given SF dir.

Mirrors the driver's sweep (queries() order, i.e. SWEEP_ORDER, collecting
each query) to find where the sweep's budget goes.

Usage: python tools/time_queries.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from stackai_vector_db_spark.queries import queries  # noqa: E402
from stackai_vector_db_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(shuffle_partitions=8)
    t_all = time.perf_counter()
    times = []
    for name, fn in queries().items():
        t0 = time.perf_counter()
        try:
            n = len(fn(spark, sf_dir).collect())
            err = ""
        except Exception as e:  # noqa: BLE001
            n, err = -1, str(e)[:80]
        dt = time.perf_counter() - t0
        times.append((dt, name))
        print(f"{dt:7.2f}s  {name}  rows={n} {err}", flush=True)
    total = time.perf_counter() - t_all
    print(f"\nTOTAL {total:.1f}s over {len(times)} queries")
    print("slowest:")
    for dt, name in sorted(times, reverse=True)[:15]:
        print(f"  {dt:7.2f}s  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
