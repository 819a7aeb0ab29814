"""Corpus-curation operators for the LLM-training-data pipeline.

Beyond dedup (operators/dedup.py), a training-data pipeline needs:

- **benchmark decontamination**: drop/flag corpus documents sharing
  n-grams with an evaluation set, so test data never leaks into training
  data. Asymmetric containment — not the pairwise near-dup problem.
- **stratified sampling**: deterministic per-stratum rates (downsample a
  dominant language, upsample a rare one) that are reproducible across
  reruns and partitionings — hash-of-id, never ``rand()``.
- **shard packing**: assign documents to fixed token-budget shards in a
  deterministic order — the step that turns a corpus into training files.
- **PII scrubbing**: regex detection/redaction of emails/phones.

Scale story per operator is in its docstring. All expressions are native
JVM-side (HOFs, window functions, regexes); nothing collects to the
driver except the broadcast benchmark shingle set, which is small by the
operator's own contract (an eval set, not a corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from stackai_vector_db_spark.operators.dedup import with_shingle_sets

EMAIL_RE = "[a-z0-9_.]+@[a-z0-9.]+[a-z]"
PHONE_RE = "555-[0-9]{4}"


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Flag corpus docs sharing any k-token shingle with the benchmark set.

    Returns ``(id_col, contaminated boolean)`` for every shingle-able
    corpus doc (fewer than k tokens → nothing to match on, excluded by
    the shingle contract shared with the dedup operators).

    Scale shape: the benchmark is an eval set (thousands of docs), so its
    distinct shingle hashes broadcast; the corpus side is one scan +
    explode + broadcast LEFT join (hit marker) + ONE groupBy(doc_id)
    shuffle with map-side partial ``max`` — the exploded shingle rows
    collapse to one row per doc per partition before they ever shuffle.
    (The earlier semi-join → distinct → left-join shape shuffled the
    corpus twice.) Corpus cost is O(corpus tokens), independent of how
    the corpus is partitioned; no N×M pair space exists anywhere.
    """
    bench_sh = (
        with_shingle_sets(benchmark, text_col, id_col, k)
        .select(F.explode("shingle_set").alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    corpus_sh = with_shingle_sets(corpus, text_col, id_col, k)
    return (
        corpus_sh.select(id_col, F.explode("shingle_set").alias("h"))
        .join(F.broadcast(bench_sh), "h", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.max("__hit"), F.lit(False)).alias("contaminated"))
    )


def stratified_sample_col(
    id_col: Column, stratum_col: Column, rates: dict[str, int], default_pct: int
) -> Column:
    """Deterministic keep-predicate: keep a row iff
    ``mix(knuth_hash(id)) mod 100 < pct(stratum)``.

    Knuth-multiplicative hash of the id — reproducible across reruns,
    partitionings and engines (pure BIGINT arithmetic, no engine hash
    function), unlike ``rand(seed)`` whose draw order is partition-
    dependent. Per-stratum pct encodes the curation policy (e.g. keep 5%
    of the dominant language, 20% of the rest).

    Overflow contract: the id is folded to 31 bits BEFORE the multiply so
    the int64 product never exceeds (2^31)·2654435761 ≈ 5.7e18 < 2^63 —
    no silent wrap in Spark, no overflow error in an ANSI engine; the
    32-bit fold of the product then keeps the genuinely-mixing high bits
    (a bare mod-100 of the raw product collapses the multiplier to
    id·61 mod 100), and the shift-xor folds those high bits into the low
    bucket bits."""
    x = F.pmod(id_col, F.lit(2147483648))  # 31-bit fold: product stays in int64
    h = F.pmod(x * F.lit(2654435761), F.lit(4294967296))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    bucket = F.pmod(h, F.lit(100))
    pct = F.lit(default_pct)
    for value, p in rates.items():
        pct = F.when(stratum_col == value, F.lit(p)).otherwise(pct)
    return bucket < pct


def shard_pack(
    docs: DataFrame,
    budget: int,
    tokens_col: str,
    part_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc a shard id so contiguous docs (in ``order_col``
    order, per ``part_col`` partition) fill ~``budget`` tokens per shard:
    ``shard = floor(exclusive_prefix_sum(tokens) / budget)``.

    The contiguous-fill rule (vs true bin packing, which is inherently
    sequential) is the standard corpus-sharding choice: deterministic,
    one window over a (part, order) sort — exactly a shuffle by
    ``part_col`` then a sorted scan, no iteration. At 100 TB the
    partition column keeps every window local to its language/source
    split; a straggler language can be further split by a salt column
    folded into ``part_col`` upstream."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return docs.withColumn(
        "shard_id", F.floor(prefix / F.lit(budget)).cast("int")
    )


def pii_scrub(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Detect and redact emails/phone patterns; adds ``n_emails``,
    ``n_phones`` and a ``clean_text`` column with matches replaced by
    fixed-width sentinels. Pure JVM regex — one scan, no shuffle; the
    regexes are RE2-compatible (char classes + bounded quantifiers only)
    so the DuckDB oracle runs the identical patterns."""
    t = F.col(text_col)
    return docs.withColumn(
        "n_emails", F.regexp_count(t, F.lit(EMAIL_RE)).cast("int")
    ).withColumn(
        "n_phones", F.regexp_count(t, F.lit(PHONE_RE)).cast("int")
    ).withColumn(
        "clean_text",
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
    )
