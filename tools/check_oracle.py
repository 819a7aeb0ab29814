"""Local correctness gate mimicking the driver's DuckDB-oracle compare.

Runs every registered query at a given SF dir, runs its oracle SQL in
DuckDB over the same parquet files, and compares row count, schema width,
and values (columns sorted by name, rows sorted) — exact equality, same as
a value hash would demand.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from stackai_vector_db_spark.catalog import TABLES  # noqa: E402
from stackai_vector_db_spark.queries import REGISTRY  # noqa: E402
from stackai_vector_db_spark.session import get_spark  # noqa: E402


STRICT = os.environ.get("ORACLE_STRICT", "1") == "1"


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT:
            # full-precision, sign-of-zero-exact repr — mirrors the driver's
            # value hash, which catches both low-bit double differences and
            # -0.0 vs +0.0 (the q_knn_window_rank round-1 failure class)
            return repr(v)
        # collapse -0.0 and format consistently
        if v == 0:
            v = 0.0
        return f"{v:.6f}" if abs(v) < 1e15 else repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(shuffle_partitions=8)
    failures = []
    for name, qd in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            sdf = qd.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if qd.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            ores = con.execute(qd.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        sc, sr = norm_rows(scols, [tuple(r) for r in srows])
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orr):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            continue
        bad = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
        if bad:
            failures.append(name)
            i = bad[0]
            print(f"FAIL  {name}: {len(bad)} mismatched rows; first at {i}:")
            print(f"      spark : {sr[i]}")
            print(f"      oracle: {orr[i]}")
            continue
        print(f"OK    {name}: {len(sr)} rows, {len(sc)} cols")

    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
