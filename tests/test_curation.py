"""Unit semantics for the corpus-curation operators (operators/curation.py):
decontamination containment, sampling determinism under repartitioning,
shard-packing boundaries, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from stackai_vector_db_spark.operators.curation import (
    decontaminate,
    pii_scrub,
    shard_pack,
    stratified_sample_col,
)


def test_decontaminate_flags_shared_ngrams(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "something about the quick brown fox here"),  # shares 3-gram
            (11, "entirely different words with no overlap at all"),
            (12, "quick brown dog runs"),  # no shared 3-shingle
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["contaminated"] for r in decontaminate(corpus, bench).collect()}
    assert got == {10: True, 11: False, 12: False}


def test_decontaminate_short_docs_excluded(spark):
    bench = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(10, "a b")], "doc_id long, text string"  # < 3 tokens: not shingle-able
    )
    assert decontaminate(corpus, bench).count() == 0


def test_stratified_sample_deterministic_across_partitionings(spark):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("lang"),
    )
    keep = stratified_sample_col(F.col("doc_id"), F.col("lang"), {"en": 5}, 20)
    a = sorted(r["doc_id"] for r in docs.filter(keep).collect())
    b = sorted(
        r["doc_id"] for r in docs.repartition(13).filter(keep).collect()
    )
    assert a == b and len(a) > 0
    # en stratum sampled at a visibly lower rate than fr
    counts = (
        docs.filter(keep).groupBy("lang").count().collect()
    )
    by_lang = {r["lang"]: r["count"] for r in counts}
    assert by_lang.get("en", 0) / 334 < by_lang["fr"] / 666


def test_stratified_sample_large_ids_no_overflow(spark):
    """ids past 2^32 must hash into [0,100) — the raw id·2654435761
    product wraps int64 above ~3.47e9; the 31-bit pre-fold keeps the
    arithmetic exact and cross-engine (an ANSI engine would raise on the
    wrap). Spark must agree with the plain-Python reference hash."""
    big = [2**31 - 1, 2**32 + 7, 2**40 + 123, 2**62 + 5]
    docs = spark.createDataFrame([(i, "en") for i in big], "doc_id long, lang string")

    def ref_keep(i: int, pct: int = 37) -> bool:
        h = ((i % 2**31) * 2654435761) % 2**32
        return ((h ^ (h >> 16)) % 100) < pct

    keep = stratified_sample_col(F.col("doc_id"), F.col("lang"), {}, 37)
    got = {
        r["doc_id"]: r["k"]
        for r in docs.select("doc_id", keep.alias("k")).collect()
    }
    assert got == {i: ref_keep(i) for i in big}


def test_shard_pack_boundaries(spark):
    docs = spark.createDataFrame(
        [(i, "x", 60) for i in range(10)], "doc_id long, lang string, toks long"
    )
    out = shard_pack(docs, budget=100, tokens_col="toks", part_col="lang")
    got = {r["doc_id"]: r["shard_id"] for r in out.collect()}
    # exclusive prefix sums: 0,60,120,... → shard = prefix // 100
    assert got == {i: (i * 60) // 100 for i in range(10)}


def test_pii_scrub_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach me at jo.doe@mail.example.org or 555-0133 thanks"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert "<EMAIL>" in rows[1]["clean_text"] and "<PHONE>" in rows[1]["clean_text"]
    assert "@" not in rows[1]["clean_text"]
    assert rows[2]["n_emails"] == 0 and rows[2]["clean_text"] == "no pii here"


def test_repetition_stats_exact_arithmetic(spark, tmp_path):
    """q_repetition_stats: all-integer micro-unit signals on hand-computed
    docs — repeats, boundary at the 60% dup threshold, 1-word doc (no
    bigrams)."""
    from stackai_vector_db_spark.queries import REGISTRY

    docs = spark.createDataFrame(
        [
            (1, "a a a a", "en", "s", 7),        # dup 3/4, top bigram 3 of 3
            (2, "b c b c b", "en", "s", 9),      # dup 3/5 == threshold, max bg 2
            (3, "hello", "en", "s", 5),          # single word: no bigrams
            (4, "w x y z q r s t u v", "en", "s", 19),  # all distinct
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["q_repetition_stats"].fn(spark, str(tmp_path)).collect()
    }
    r1 = rows[1]
    assert (r1["n_words"], r1["dup_word_micro"], r1["top_bigram_micro"]) == (
        4, 750000, 1500000,  # occupancy may exceed 1.0 on degenerate docs
    )
    assert not r1["keep"]
    r2 = rows[2]
    # 3 repeats over 5 words = exactly 600000 micro (kept: <=); bigram
    # "b c" appears twice -> 2*2e6 div 5 = 800000 (rejected)
    assert (r2["dup_word_micro"], r2["top_bigram_micro"]) == (600000, 800000)
    assert not r2["keep"]
    r3 = rows[3]
    assert (r3["n_words"], r3["dup_word_micro"], r3["top_bigram_micro"]) == (1, 0, 0)
    assert r3["keep"]
    r4 = rows[4]
    # 10 distinct words: dup 0; each bigram once -> 2*1e6 div 10 = 200000
    # which exceeds the 15% occupancy bound — short docs are inherently
    # bigram-dense; the thresholds target fixture-length (30+ word) docs.
    assert (r4["dup_word_micro"], r4["top_bigram_micro"]) == (0, 200000)


def test_domain_mix_binding_stratum_and_quotas(spark):
    """domain_mix: the stratum that runs out first caps the output; quotas
    follow target weights; strata outside the policy are dropped."""
    from stackai_vector_db_spark.operators.curation import domain_mix

    # 80 'a' docs, 20 'b' docs, 5 'junk' docs. Target a:50, b:50.
    # b binds: N = min(80*100//50, 20*100//50) = min(160, 40) = 40.
    # quota_a = 40*50//100 = 20 -> rate 250000 ppm; quota_b = 20 -> 1e6 ppm.
    rows = (
        [(i, "a") for i in range(80)]
        + [(100 + i, "b") for i in range(20)]
        + [(200 + i, "junk") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r["lang"]: r for r in domain_mix(docs, {"a": 50, "b": 50}).collect()}
    assert set(out) == {"a", "b"}  # junk is not in the mix
    assert (out["a"]["n_in"], out["a"]["rate_ppm"]) == (80, 250000)
    assert (out["b"]["n_in"], out["b"]["rate_ppm"]) == (20, 1000000)
    # rate 1e6 keeps everything deterministically
    assert out["b"]["n_kept"] == 20
    # kept counts are exact hash-bucket counts -> recompute independently
    from stackai_vector_db_spark.operators.curation import mix_hash_bucket
    from pyspark.sql import functions as F

    expect_a = (
        docs.filter(F.col("lang") == "a")
        .filter(mix_hash_bucket(F.col("doc_id"), 1_000_000) < 250000)
        .count()
    )
    assert out["a"]["n_kept"] == expect_a


def test_domain_mix_partition_invariant(spark):
    """The kept set must not depend on input partitioning."""
    from stackai_vector_db_spark.operators.curation import domain_mix

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    w = {"a": 60, "b": 40}
    one = {(r["lang"], r["n_kept"]) for r in domain_mix(docs, w).collect()}
    other = {
        (r["lang"], r["n_kept"])
        for r in domain_mix(docs.repartition(13), w).collect()
    }
    assert one == other


def test_domain_mix_zero_weight_and_absent_stratum(spark):
    """Explicit weight 0 is dropped without reaching the division
    (ANSI-safe); a target stratum absent from the corpus is surfaced as a
    zero row, not silently renormalized away."""
    from stackai_vector_db_spark.operators.curation import domain_mix

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        "doc_id long, lang string",
    )
    # weight 0: stratum b dropped entirely, no divide-by-zero
    out = {r["lang"]: r for r in domain_mix(docs, {"a": 100, "b": 0}).collect()}
    assert set(out) == {"a"}
    assert out["a"]["rate_ppm"] == 1_000_000

    # absent target stratum: zero row present, present strata still sampled
    out = {
        r["lang"]: r for r in domain_mix(docs, {"a": 50, "b": 25, "zz": 25}).collect()
    }
    assert set(out) == {"a", "b", "zz"}
    assert (out["zz"]["n_in"], out["zz"]["rate_ppm"], out["zz"]["n_kept"]) == (0, 0, 0)
    assert out["a"]["n_kept"] > 0
