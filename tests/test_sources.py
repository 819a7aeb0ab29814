"""Sources tests: embedding-client protocol (fake native path + HTTP
batched plumbing with injected transport) and validated JSON ingest with
dead-letter side-output."""

from __future__ import annotations

import json

import pytest

from stackai_vector_db_spark.sources.embedding_client import (
    FakeEmbeddingSource,
    HttpEmbeddingSource,
    create_embedding_source,
)
from stackai_vector_db_spark.sources.ingest import from_json_lines, validate_chunks


def test_fake_source_matches_formula(spark):
    src = FakeEmbeddingSource(dim=8)
    df = spark.createDataFrame([("Hello World",)], "text string")
    [row] = src.embed(df).collect()
    text = "hello world"
    cs, L, W = sum(map(ord, text)), len(text), len(text.split())
    expected = [((cs * (i + 1) + L * (i + 7) + W * (i + 13)) % 1000) / 1000.0 - 0.5
                for i in range(8)]
    assert [round(v, 9) for v in row.embedding] == [round(v, 9) for v in expected]


def test_http_source_batches_through_transport(spark):
    # The transport runs in executor workers, so report the observed batch
    # size through the embedding payload itself: [len(text), len(batch), ...].
    def transport(texts, model):
        return [[float(len(t)), float(len(texts)), 0.0, 0.0] for t in texts]

    src = HttpEmbeddingSource(dim=4, batch_size=2, transport=transport)
    df = spark.createDataFrame(
        [(i, f"t{'x' * i}") for i in range(5)], "id long, text string"
    ).coalesce(1)
    rows = {r.id: r.embedding for r in src.embed(df).collect()}
    assert len(rows) == 5
    assert rows[3][0] == 4.0  # len("txxx") == 4
    assert all(e[1] <= 2.0 for e in rows.values())  # batch_size respected


def test_http_source_default_transport_raises(spark):
    src = HttpEmbeddingSource(dim=4)
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(Exception, match="(?i)no embedding service"):
        src.embed(df).collect()


def test_factory_fallback():
    assert isinstance(create_embedding_source("nope"), FakeEmbeddingSource)
    assert isinstance(create_embedding_source("http"), HttpEmbeddingSource)


def test_json_ingest_dead_letter_split(spark):
    payloads = [
        {"chunk_id": 1, "document_id": 1, "library_id": 1, "text": "good row",
         "start_index": 0},
        {"chunk_id": 2, "document_id": 1, "library_id": 1, "text": "   ",
         "start_index": 0},
        {"chunk_id": 3, "document_id": 1, "library_id": 1, "text": "bad idx",
         "start_index": -1},
        {"chunk_id": 4, "document_id": 1, "library_id": 1, "text": "bad range",
         "start_index": 10, "end_index": 3},
        {"chunk_id": 5, "document_id": 1, "library_id": 1, "text": "bad emb",
         "start_index": 0, "embedding": [0.0, 2e6]},
        {"chunk_id": 6, "document_id": 1, "library_id": 1, "text": "bad thr",
         "start_index": 0, "similarity_threshold": 10.5},
        {"chunk_id": 7, "document_id": 1, "library_id": 1, "text": "neg thr",
         "start_index": 0, "similarity_threshold": -0.5},
        {"chunk_id": 8, "document_id": 1, "library_id": 1, "text": "edge thr ok",
         "start_index": 0, "similarity_threshold": 10.0},
    ]
    lines = spark.createDataFrame([(json.dumps(p),) for p in payloads], "value string")
    valid, errors = validate_chunks(from_json_lines(spark, lines))
    assert sorted(r.chunk_id for r in valid.collect()) == [1, 8]
    good = {r.chunk_id: r for r in valid.collect()}
    assert good[1].end_index == len("good row")
    assert good[8].similarity_threshold == 10.0  # boundary legal (ref ≤ 10)
    reasons = {r.chunk_id: r.reject_reason for r in errors.collect()}
    assert reasons == {
        2: "empty text",
        3: "negative start_index",
        4: "end_index before start_index",
        5: "embedding value out of range",
        6: "similarity_threshold out of range",
        7: "similarity_threshold out of range",
    }


def test_malformed_json_routed_to_errors(spark):
    lines = spark.createDataFrame([("{not json",)], "value string")
    valid, errors = validate_chunks(from_json_lines(spark, lines))
    assert valid.count() == 0
    assert errors.count() == 1
