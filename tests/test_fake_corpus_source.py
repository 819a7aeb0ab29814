"""Custom Python DataSource tests: registration, option handling,
partition parallelism, determinism, and end-to-end embed over the source."""

from __future__ import annotations

from stackai_vector_db_spark.sources.fake_corpus import register


def test_read_with_options(spark):
    register(spark)
    df = spark.read.format("fake_corpus").option("n", 250).option("partitions", 4).load()
    assert df.count() == 250
    assert df.columns == ["doc_id", "text", "lang", "source"]
    assert df.rdd.getNumPartitions() == 4
    assert df.select("lang").distinct().count() == 5


def test_deterministic_across_reads(spark):
    register(spark)
    a = spark.read.format("fake_corpus").option("n", 50).load().collect()
    b = spark.read.format("fake_corpus").option("n", 50).load().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_embed_pipeline_over_custom_source(spark):
    from stackai_vector_db_spark.functions.vector import add_fake_embedding

    register(spark)
    df = spark.read.format("fake_corpus").option("n", 40).load()
    out = add_fake_embedding(df, "text", 8, "emb")
    rows = out.select("doc_id", "emb").collect()
    assert len(rows) == 40
    assert all(len(r.emb) == 8 for r in rows)


def test_streaming_reader_matches_batch(spark, tmp_path):
    """readStream over the custom source: micro-batched offsets must
    reproduce exactly the batch read's rows (one source, two modes)."""
    register(spark)
    stream = (
        spark.readStream.format("fake_corpus")
        .option("n", 120)
        .option("batch_size", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_corpus_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    # The stream is bounded (n=120): once the offset reaches the limit,
    # read() returns an empty window and the offset stops advancing, so
    # processAllAvailable() terminates exactly when the stream has drained.
    # (A wall-clock poll here was flaky under heavy parallel-suite load.)
    # Watchdog: if the bound regresses (e.g. the reader stops clamping to
    # n), processAllAvailable would block forever — kill the query after a
    # generous deadline so the test fails visibly instead of hanging CI.
    import threading

    watchdog = threading.Timer(300, q.stop)
    watchdog.start()
    try:
        q.processAllAvailable()
    finally:
        watchdog.cancel()
        q.stop()
    got = sorted(map(tuple, spark.table("t_corpus_stream").collect()))
    want = sorted(
        map(tuple, spark.read.format("fake_corpus").option("n", 120).load().collect())
    )
    assert got == want
