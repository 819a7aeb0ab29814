"""File-format connectors for the chunk schema.

The reference ingests exclusively via HTTP JSON bodies
(``app/routers/chunks.py:109-148``); a pipeline engine needs file sources.
All readers land on the same typed schema and route through
``ingest.validate_chunks`` — one validation surface regardless of wire
format. All readers take explicit schemas (never inferSchema: a schema
inference pass over 100 TB is a full extra scan, and inferred types drift
between files).

Formats: JSONL and CSV in, parquet / ORC / JSON out. CSV carries the
embedding array as a JSON-encoded string column (arrays are not
CSV-native); the reader parses it back. Avro would need the external
spark-avro package — not available in this environment, so it is
deliberately absent rather than stubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from stackai_vector_db_spark.sources.ingest import CHUNK_JSON_SCHEMA

# CSV twin of CHUNK_JSON_SCHEMA: embedding is a JSON string column.
CHUNK_CSV_SCHEMA = (
    "chunk_id long, document_id long, library_id long, text string, "
    "embedding_json string, start_index int, end_index int"
)


def read_chunks_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One JSON object per line → typed rows. ``columnNameOfCorruptRecord``
    keeps malformed lines as rows with null fields + the raw payload in
    ``_raw`` so the validator dead-letters them instead of dropping."""
    return (
        spark.read.schema(CHUNK_JSON_SCHEMA + ", _raw string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_raw")
        .json(path)
    )


def read_chunks_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV → typed rows; the embedding column is JSON-decoded. Quote/escape
    defaults handle embedded commas in text; multiline text requires
    ``multiLine`` which is NOT enabled (it makes the file unsplittable — a
    single 100 GB CSV would land on one task)."""
    raw = (
        spark.read.schema(CHUNK_CSV_SCHEMA)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return raw.select(
        "chunk_id",
        "document_id",
        "library_id",
        "text",
        F.from_json(F.col("embedding_json"), "array<double>").alias("embedding"),
        "start_index",
        "end_index",
    )


def write_chunks(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Sink helper: parquet (the engine's native layout), ORC, or JSON.
    CSV sinks JSON-encode the embedding (symmetric with the reader)."""
    out = df
    if fmt == "csv":
        # Column order must match CHUNK_CSV_SCHEMA: explicit-schema CSV reads
        # bind by position, not by header name.
        out = df.select(
            "chunk_id",
            "document_id",
            "library_id",
            "text",
            F.to_json("embedding").alias("embedding_json"),
            "start_index",
            "end_index",
        )
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def read_chunks(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Format-dispatching reader returning the typed chunk schema."""
    if fmt == "jsonl" or fmt == "json":
        return read_chunks_jsonl(spark, path).drop("_raw")
    if fmt == "csv":
        return read_chunks_csv(spark, path)
    if fmt in ("parquet", "orc"):
        return getattr(spark.read.schema(CHUNK_JSON_SCHEMA), fmt)(path)
    raise ValueError(f"unsupported format {fmt!r}")
