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


def test_density_knobs_default_identity_and_effect(spark):
    """The r8 density knobs (period, dup_per_100): explicit defaults must
    reproduce the original generator byte-identically (every committed
    probe count depends on it), a period > n with dup_per_100=0 yields
    all-unique texts (the density-matched operating point), and
    dup_per_100=0 removes every planted suffix copy."""
    register(spark)
    base = spark.read.format("fake_corpus").option("n", 300).load().collect()
    knob = (
        spark.read.format("fake_corpus").option("n", 300)
        .option("period", 1_000_003).option("dup_per_100", 3)
        .option("token_mixer", "linear")
        .load().collect()
    )
    assert sorted(map(tuple, base)) == sorted(map(tuple, knob))
    uniq = (
        spark.read.format("fake_corpus").option("n", 5000)
        .option("period", 1_000_000_007).option("dup_per_100", 0)
        .option("token_mixer", "hashed")
        .load()
    )
    texts = [r["text"] for r in uniq.collect()]
    assert len(set(texts)) == 5000
    assert not any(t.endswith(" trailing extra tokens") for t in texts)


def test_resonance_ceiling_arithmetic():
    """The r8 20M-notch finding, pinned without Spark: the hashed mixer
    remaps token values pointwise, so docs whose ids differ by
    Δ(d) = d·31⁻¹·K⁻¹ mod period share a d-shifted IDENTICAL token
    window. For the original period 1,000,000,007 the floor is
    Δ(14) = 15,637,891 — inside a 20M corpus (the measured 5.4× span-dup
    surge) but outside 10M (why the 2.5-10M density series stayed
    clean). The documented replacement 4,000,000,553 keeps every Δ(d),
    d ≤ 32, above 112M."""
    from stackai_vector_db_spark.sources.fake_corpus import _doc_text

    K = 2654435761

    def floor(period):
        inv = pow(31 * K, -1, period)
        return min(
            min(d * inv % period, period - d * inv % period)
            for d in range(1, 33)
        )

    assert floor(1_000_000_007) == 15_637_891
    assert floor(4_000_000_553) == 112_350_918
    # r10 candidate for notches past 112M (prime, floor near the p/32
    # optimum): validated at 5M (planted counts land beside the recorded
    # row), clean through 240M docs
    assert floor(8_000_029_883) == 241_979_406
    # generator validity for every density-series notch run to date —
    # the largest (80M, r9) sits well under the replacement's floor, so
    # planted dups are the ONLY dups and counts must stay linear
    assert floor(4_000_000_553) > 80_000_000
    # concrete collision at the old period: a shared >= 8-token window
    a, b = 1000, 1000 + 15_637_891
    wa = _doc_text(a, 1_000_000_007, 3, "hashed").split()
    wb = _doc_text(b, 1_000_000_007, 3, "hashed").split()
    assert len(set(wa) & set(wb)) >= 8
    # same doc pair under the replacement period: disjoint token streams
    ca = _doc_text(a, 4_000_000_553, 3, "hashed").split()
    cb = _doc_text(b, 4_000_000_553, 3, "hashed").split()
    assert not (set(ca) & set(cb))


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


def test_start_slice_matches_full_read(spark):
    """The `start` offset emits exactly the same rows as the matching id
    range of a full read — _doc_text is a pure function of doc_id, so a
    sliced read IS the batch, at batch cost (the lever the incremental
    span probe uses to process 80M docs as K generator-sliced batches
    instead of K filtered full scans)."""
    register(spark)
    full = {
        r.doc_id: (r.text, r.lang, r.source)
        for r in spark.read.format("fake_corpus").option("n", 300).load().collect()
    }
    sliced = (
        spark.read.format("fake_corpus")
        .option("n", 100)
        .option("start", 150)
        .option("partitions", 3)
        .load()
        .collect()
    )
    assert sorted(r.doc_id for r in sliced) == list(range(150, 250))
    for r in sliced:
        assert (r.text, r.lang, r.source) == full[r.doc_id]
