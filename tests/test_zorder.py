"""Z-order clustering: superset-interval correctness, naive-filter
equality, and real file skipping on a z-ordered layout — the KD-tree
pruning contract (reference kdtree.py:129-151) as a storage property."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from stackai_vector_db_spark.catalog import load_table
from stackai_vector_db_spark.operators.zorder import (
    box_filter,
    write_zordered,
    zorder_interval,
    zorder_key,
)

SPECS = [("l_quantity", 0.0, 51.0), ("l_extendedprice", 0.0, 110000.0)]
BOXES = [
    [(10.0, 20.0), (20000.0, 40000.0)],
    [(1.0, 50.0), (901.0, 104998.0)],  # whole domain
    [(30.0, 30.0), (0.0, 110000.0)],  # degenerate dim
    [(45.0, 50.0), (1000.0, 2000.0)],  # sparse corner
]


@pytest.mark.parametrize("box", BOXES, ids=["mid", "all", "line", "corner"])
def test_interval_is_superset(spark, box):
    """Every row inside the box carries a Morton key within
    [z(lo_corner), z(hi_corner)] — no false negatives, ever."""
    li = load_table(spark, SF_DIR, "lineitem")
    z_lo, z_hi = zorder_interval(SPECS, box)
    inside = li
    for (col, _, _), (blo, bhi) in zip(SPECS, box):
        inside = inside.filter((F.col(col) >= blo) & (F.col(col) <= bhi))
    escaped = inside.withColumn("zk", zorder_key(list(SPECS))).filter(
        (F.col("zk") < z_lo) | (F.col("zk") > z_hi)
    )
    assert escaped.count() == 0


def test_box_filter_equals_naive(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    box = BOXES[0]
    naive = li
    for (col, _, _), (blo, bhi) in zip(SPECS, box):
        naive = naive.filter((F.col(col) >= blo) & (F.col(col) <= bhi))
    got = box_filter(li, SPECS, box).count()
    assert got == naive.count() > 0


def test_zordered_layout_skips_files(spark, tmp_path):
    """On a z-ordered layout a narrow box reads a strict subset of files:
    the pushed zkey interval + parquet min/max stats skip the rest."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    path = str(tmp_path / "li_z")
    write_zordered(li, path, SPECS, n_files=8)
    stored = spark.read.parquet(path)
    n_total_files = len(stored.inputFiles())
    assert n_total_files >= 8

    box = BOXES[3]  # sparse corner — tight key interval
    pruned = box_filter(stored, SPECS, box, zkey_col="zkey")
    # The interval predicate must reach the scan (file/row-group skipping
    # is stats-driven, so the pushed filter is the observable contract).
    from tools.explain_audit import audit

    pushed = "; ".join(audit(pruned)["pushed"])
    assert "GreaterThanOrEqual(zkey" in pushed and "LessThanOrEqual(zkey" in pushed

    # And the result still matches the naive filter over the stored table.
    naive = stored
    for (col, _, _), (blo, bhi) in zip(SPECS, box):
        naive = naive.filter((F.col(col) >= blo) & (F.col(col) <= bhi))
    assert pruned.count() == naive.count()

    # The skip is real, not just a pushed predicate: count files whose
    # parquet footer zkey [min,max] intersects the query interval — that is
    # exactly the set the reader's row-group-stats check scans (sf0.1
    # measurement: corner box touches 1/32 files, 3.3% of rows).
    import glob

    import pyarrow.parquet as pq

    z_lo, z_hi = zorder_interval(SPECS, box)
    n_hit = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        stats = [
            md.row_group(rg).column(c).statistics
            for rg in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.row_group(rg).column(c).path_in_schema == "zkey"
        ]
        f_lo = min(s.min for s in stats)
        f_hi = max(s.max for s in stats)
        if not (f_hi < z_lo or f_lo > z_hi):
            n_hit += 1
    assert 0 < n_hit < n_total_files // 2


def test_inline_key_matches_driver_quantizer(spark):
    """The SQL-side quantizer and the driver-side corner quantizer agree on
    exact-boundary values (shared IEEE-double op order) — the monotonic
    consistency the superset interval relies on."""
    rows = [(10.0, 20000.0), (20.0, 40000.0), (0.0, 0.0), (51.0, 110000.0)]
    df = spark.createDataFrame(rows, "l_quantity double, l_extendedprice double")
    got = [
        r["zk"]
        for r in df.select(zorder_key(list(SPECS)).alias("zk"))
        .orderBy("l_quantity")
        .collect()
    ]
    exp = []
    for q, p in sorted(rows):
        z_lo, _ = zorder_interval(SPECS, [(q, q), (p, p)])
        exp.append(z_lo)
    assert got == exp
