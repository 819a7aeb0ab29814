"""Arrow batch kernel for the corpus-pipeline scoring stage (r12, guide §4).

``corpus_features_arrow`` computes, per document, exactly what the
q_corpus_pipeline projection computed with JVM expressions —
``sha2(text, 256)``, ``lang_id(text)``, ``round(quality_score(text), 6)``
and ``token_count_ws(text)`` — in one ``mapInArrow`` pass: the text column
crosses the Python boundary once as Arrow batches, each ~300-char document
is scored in a few µs of C-backed Python (re.split / str.translate /
hashlib / set lookups) instead of ~1 ms of interpreted Catalyst expression
evaluation (measured at sf0.1: the expression stage costs 0.15–0.20 s over
a 0.1 s scan for 5,000 docs — java.util.regex split×3, a per-position CJK
``regexp_extract_all``, ``translate``, sha2 and the CASE tree per row).
The text body is DROPPED inside the kernel, so only ~90 B of scalars per
document ever reach the downstream dedup exchange — same property the
sha2-key projection had.

Exact-parity contract (the DuckDB oracle hash-checks every downstream
value, so "close" is failure). Each JVM semantic this kernel must
reproduce was probed on this Spark build and is pinned in
tests/test_text_arrow.py:

- ``trim`` strips U+0020 ONLY (not \\t/\\n/\\x0b) → ``str.strip(' ')``.
- java ``\\s`` (no UNICODE_CHARACTER_CLASS) is exactly ``[ \\t\\n\\x0b\\f\\r]``
  (U+00A0/U+2028 are NOT whitespace) and ``split`` with Spark's limit=-1
  keeps leading AND trailing empty fields → ``re.split`` on the explicit
  class (re.split keeps both empties too, and the pattern cannot match an
  empty string). A tabs-only document therefore counts 2 "words" — pinned.
- ``length`` counts code points (astral chars = 1) → ``len`` on str.
- ``lower``: java ``toLowerCase`` applies the final-sigma contextual rule
  (ΣΣ → σς) which ``str.lower`` does not (σσ). The lowered string is only
  an INTERMEDIATE here — it feeds equality against ASCII stopwords and the
  CJK range check, and no Greek-sigma form can equal an ASCII stopword or
  fall in [U+4E00, U+9FFF] — so every count this kernel emits is invariant
  under the divergence (pinned with a Greek case in the parity tests).
- ``round(x, 6)`` is java BigDecimal HALF_UP over ``Double.toString`` —
  decimal-string rounding, not binary. Fast path: binary HALF_UP
  (floor(x·1e6 + 0.5)); any row whose scaled fraction sits within 1e-6 of
  the .5 tie gets the exact ``Decimal(repr(x))`` HALF_UP treatment, which
  agrees with java off the tie because repr and Double.toString both
  round-trip the same double (differences far below the 1e-6 margin).
- The score's float arithmetic replays the Catalyst tree in the same
  left-to-right IEEE-double order: ((0.4·a) + (0.4·b)) + (0.2·c) with the
  same guards (0-word → 0 stopword ratio, empty text → 0 punct ratio).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

from stackai_vector_db_spark.functions.text import LANG_STOPWORDS, _PUNCT_KEEP

# java \s under default (non-UNICODE_CHARACTER_CLASS) semantics.
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
_CJK_RE = re.compile("[一-鿿]")
# translate(t, _PUNCT_KEEP, ''): delete the 68 allowed chars, count the rest.
_PUNCT_DEL = str.maketrans("", "", _PUNCT_KEEP)
# token → bit of the language whose stopword set contains it (sets are
# disjoint except 'la' (es+fr) and 'de' (es) vs 'der'... — build a mask).
_LANGS = ("en", "es", "de", "fr")
_SW_MASK: dict[str, int] = {}
for _i, _lang in enumerate(_LANGS):
    for _w in LANG_STOPWORDS[_lang]:
        _SW_MASK[_w] = _SW_MASK.get(_w, 0) | (1 << _i)


def _java_round6(x: float) -> float:
    """java ``round(double, 6)``: BigDecimal(Double.toString(x)) HALF_UP."""
    y = x * 1e6
    fl = float(int(y // 1))
    frac = y - fl
    if abs(frac - 0.5) < 1e-6:
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
    return (fl + 1.0) / 1e6 if frac >= 0.5 else fl / 1e6


def score_doc(text: str | None) -> tuple:
    """(sha256 hex, lang_pred, rounded score, words) for one document —
    value-identical to the JVM expression stage (see module docstring)."""
    if text is None:
        # Pinned against the expression stage on a NULL text row (not in
        # any fixture, but the kernel must not crash or diverge): sha2 and
        # the word count are null; F.least SKIPS nulls so the null word /
        # stopword terms each contribute their 1.0 cap and the null punct
        # term contributes 0 → score 0.4 + 0.4 + 0.2·0 = 0.8; the lang CASE
        # falls through every null condition to its 'fr' otherwise-branch.
        return (None, "fr", 0.8, None)
    n = len(text)
    trimmed = text.strip(" ")
    # token_count_ws(text): empty-after-trim → 0, else java split count.
    words = 0 if not trimmed else len(_JAVA_WS_RE.split(trimmed))
    # lang_id / stopword_ratio tokens come from lower(trim(text)).
    low = trimmed.lower()
    toks = _JAVA_WS_RE.split(low) if low else [""]
    hits = [0, 0, 0, 0]
    for tok in toks:
        m = _SW_MASK.get(tok)
        if m:
            if m & 1:
                hits[0] += 1
            if m & 2:
                hits[1] += 1
            if m & 4:
                hits[2] += 1
            if m & 8:
                hits[3] += 1
    # lang_id: CJK anywhere ⇒ zh; else argmax hits, ties en < es < de < fr,
    # all-zero ⇒ en.
    if _CJK_RE.search(low):
        lang_pred = "zh"
    else:
        best = max(hits)
        if best == 0 or hits[0] == best:
            lang_pred = "en"
        elif hits[1] == best:
            lang_pred = "es"
        elif hits[2] == best:
            lang_pred = "de"
        else:
            lang_pred = "fr"
    # stopword_ratio's denominator is token_count_ws(lower(trim(text))) —
    # same split count as `words` (lowercasing never creates java-\s chars),
    # but computed from the lowered string exactly like the expression.
    total = 0 if not low.strip(" ") else len(toks)
    swr = 0.0 if total == 0 else hits[0] / float(total)
    # punct_ratio over the RAW text.
    praw = 0.0 if n == 0 else len(text.translate(_PUNCT_DEL)) / float(n)
    # quality_score, same IEEE-double evaluation order as the Catalyst tree.
    score = (
        0.4 * min(1.0, words / 50.0)
        + 0.4 * min(1.0, 10.0 * swr)
        + 0.2 * (1.0 - min(1.0, 5.0 * praw))
    )
    return (
        hashlib.sha256(text.encode("utf-8")).hexdigest(),
        lang_pred,
        _java_round6(score),
        words,
    )


CORPUS_FEATURES_SCHEMA = (
    "doc_id long, __key string, lang string, lang_pred string, "
    "score double, words long"
)


def corpus_features_arrow(docs: DataFrame) -> DataFrame:
    """``docs`` must carry (doc_id, lang, text); returns the scored
    projection (doc_id, __key, lang, lang_pred, score, words) via one
    mapInArrow stage. Column-pruned input (guide §4.1): callers select the
    three columns first so the scan never ships more."""
    import pyarrow as pa

    def part(batches):
        for batch in batches:
            texts = batch.column("text").to_pylist()
            keys, preds, scores, words = [], [], [], []
            for t in texts:
                k, p, s, w = score_doc(t)
                keys.append(k)
                preds.append(p)
                scores.append(s)
                words.append(w)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(keys, pa.string()),
                    batch.column("lang"),
                    pa.array(preds, pa.string()),
                    pa.array(scores, pa.float64()),
                    pa.array(words, pa.int64()),
                ],
                names=["doc_id", "__key", "lang", "lang_pred", "score", "words"],
            )

    return docs.select("doc_id", "lang", "text").mapInArrow(
        part, schema=CORPUS_FEATURES_SCHEMA
    )
