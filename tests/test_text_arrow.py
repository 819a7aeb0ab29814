"""Java↔Python parity for the corpus-scoring Arrow kernel (r12).

The kernel replaces the q_corpus_pipeline scoring projection, whose every
output the DuckDB oracle hash-checks downstream — so the kernel must agree
with the JVM expression stage EXACTLY (bit-equal doubles included) on the
known Java/Python divergence minefield: trim/\\s/split/lower/length/round
semantics. The adversarial corpus below encodes each pinned behavior; the
fixture test sweeps every real document at two SFs.
"""

import pytest
from pyspark.sql import functions as F

from stackai_vector_db_spark.functions.text import (
    lang_id,
    quality_score,
    token_count_ws,
)
from stackai_vector_db_spark.functions.text_arrow import (
    corpus_features_arrow,
    score_doc,
)

ADVERSARIAL = [
    "",                      # empty: words 0, praw guard, lang en
    "   ",                   # spaces only: trim → empty
    "\t\t",                  # java trim keeps tabs: split → ['',''] = 2 words
    "\ta b",                 # leading tab survives trim: leading '' token
    "a b\n",                 # trailing newline: trailing '' token
    "\x0bx\x0b",             # U+000B IS java \s (not RE2's)
    "\xa0x\xa0",             # NBSP is NOT java \s
    "a b",              # line separator is NOT java \s
    "the and of to in",      # all-en stopwords
    "el la de que los",      # es
    "der die und das ist",   # de
    "le la les des est",     # fr
    "la de",                 # es/fr overlap tokens, tie-break order
    "THE AND OF",            # lowercasing feeds the stopword match
    "中文 text here",         # CJK ⇒ zh regardless of stopwords
    "兀" + "the and " * 10,   # CJK boundary char U+5140 inside text
    "一",                # CJK range start
    "鿿",                # CJK range end
    "䷿ ꀀ",         # just OUTSIDE the CJK range on both sides
    "ΣΣ ςσ ﬁne İstanbul",    # final-sigma: java lower ≠ str.lower (counts invariant)
    "STRASSE ß",
    "ab\U0001F600cd",        # astral char: length counts code points
    "!?!?!?",                # pure punctuation
    "a,b.c;d:e!f?g",         # punct interleaved
    "word " * 60,            # words ≥ 50 caps the length term
    "the " * 200,            # high stopword ratio, long doc
    "x" * 577,               # max fixture length, zero stopwords
    "9 42 777 0x1f",         # digits are not punct
    " the ",                 # trimmed to a single stopword
    "the\tand\nof\x0bto\fin\r",  # every java-\s char as separator
    None,                    # null text: least() skips nulls → score 0.8
]


def _expr_scored(df):
    return df.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("__key"),
        "lang",
        lang_id(F.col("text")).alias("lang_pred"),
        F.round(quality_score(F.col("text")), 6).alias("score"),
        token_count_ws(F.col("text")).cast("long").alias("words"),
    )


def _assert_parity(spark, df):
    want = {r["doc_id"]: r for r in _expr_scored(df).collect()}
    got = {r["doc_id"]: r for r in corpus_features_arrow(df).collect()}
    assert set(want) == set(got)
    for i in want:
        w, g = want[i], got[i]
        for col in ("__key", "lang", "lang_pred", "words"):
            assert g[col] == w[col], (i, col, g[col], w[col], w)
        # bit-exact doubles: the oracle hash formats %.6f downstream, but
        # the engine contract here is exact replay of the JVM arithmetic.
        assert (g["score"] is None) == (w["score"] is None), (i, g, w)
        if w["score"] is not None:
            assert g["score"] == w["score"], (i, g["score"], w["score"])


def test_kernel_matches_expressions_on_adversarial_corpus(spark):
    df = spark.createDataFrame(
        [(i, "x", t) for i, t in enumerate(ADVERSARIAL)],
        "doc_id long, lang string, text string",
    )
    _assert_parity(spark, df)


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_kernel_matches_expressions_on_fixture(spark, sf):
    from stackai_vector_db_spark.catalog import load_table

    df = load_table(spark, f"/root/testdata/sf{sf}", "documents").select(
        "doc_id", "lang", "text"
    )
    _assert_parity(spark, df)


def test_score_doc_null_matches_expression_pin():
    assert score_doc(None) == (None, "fr", 0.8, None)


def test_round6_tie_cases():
    """Decimal HALF_UP at exact 7-digit ties, where binary HALF_UP and
    numpy's HALF_EVEN would both diverge from java."""
    from stackai_vector_db_spark.functions.text_arrow import _java_round6

    assert _java_round6(0.0000005) == 0.000001   # binary 4.999…e-7 → up
    assert _java_round6(0.1234565) == 0.123457   # binary …649999 → up
    assert _java_round6(0.1234575) == 0.123458   # half-even would give …58 too
    assert _java_round6(0.12345649) == 0.123456
    assert _java_round6(1.0) == 1.0
    assert _java_round6(0.0) == 0.0


def test_corpus_pipeline_gate_picks_kernel_by_volume(spark, monkeypatch):
    """The scoring-path gate keys on input VOLUME: below the threshold the
    plan carries the JVM expression projection (no Python eval node),
    above it the Arrow kernel (MapInArrow/ArrowEval node). Results are
    identical either way (oracle + parity tests)."""
    from stackai_vector_db_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(Q, "_TEXT_KERNEL_MIN_BYTES", 1 << 60)
    small = Q.q_corpus_pipeline(spark, sf)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "mapInArrow" not in plan_small and "ArrowEval" not in plan_small

    monkeypatch.setattr(Q, "_TEXT_KERNEL_MIN_BYTES", 0)
    big = Q.q_corpus_pipeline(spark, sf)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan_big or "mapInArrow" in plan_big

    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, big.collect()))
    assert a == b
