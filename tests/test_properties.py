"""Property-based tests (hypothesis): the HOF column expressions must agree
with an independent numpy/pure-Python oracle on arbitrary inputs — beyond
the reference's example-based testing (SURVEY.md §5.1: the reference has no
property tests; the distance/embedding kernels are exactly where float and
unicode edge cases hide)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import example, given, settings, strategies as st

from pyspark.sql import functions as F

from stackai_vector_db_spark.functions.vector import (
    cosine_distance,
    euclidean_distance,
    fake_embedding,
)

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=1, max_size=16)
pair = st.integers(min_value=1, max_value=16).flatmap(
    lambda d: st.tuples(
        st.lists(finite, min_size=d, max_size=d),
        st.lists(finite, min_size=d, max_size=d),
    )
)


@settings(max_examples=8, deadline=None)
@given(pair)
def test_euclidean_matches_numpy(spark, vectors):
    a, b = vectors
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    [row] = df.select(euclidean_distance("a", "b").alias("d")).collect()
    expected = float(np.linalg.norm(np.array(a) - np.array(b)))
    assert math.isclose(row.d, expected, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=8, deadline=None)
@given(pair)
def test_cosine_matches_numpy_with_guard(spark, vectors):
    a, b = vectors
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    [row] = df.select(cosine_distance("a", "b").alias("d")).collect()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        expected = 1.0  # reference zero-norm guard, base.py:218-219
    else:
        expected = 1.0 - float(np.dot(a, b)) / (na * nb)
    assert math.isclose(row.d, expected, rel_tol=1e-9, abs_tol=1e-9)


def _reference_fake_embedding(text: str, dim: int) -> list[float]:
    """Pure-Python transcription of the reference formula
    (clients/embedding.py:95-127): lowercase+strip, char codepoint sum,
    length, whitespace word count."""
    t = text.strip().lower()
    cs = sum(ord(c) for c in t)
    L = len(t)
    W = len(t.split())
    return [
        ((cs * (i + 1) + L * (i + 7) + W * (i + 13)) % 1000) / 1000.0 - 0.5
        for i in range(dim)
    ]


texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFFF
    ),
    min_size=0,
    max_size=200,
)


@settings(max_examples=10, deadline=None)
@given(texts, st.integers(min_value=1, max_value=32))
@example("\x1f", 1)     # Python strips \x1c-\x1f; Spark trim() does not —
@example("a\xa0b", 4)   # found by hypothesis, fixed via py_trim/py_word_count
@example(" 　 mixed ws ", 3)
def test_fake_embedding_matches_reference_on_arbitrary_unicode(spark, text, dim):
    df = spark.createDataFrame([(text,)], "text string")
    [row] = df.select(fake_embedding(F.col("text"), dim).alias("e")).collect()
    expected = _reference_fake_embedding(text, dim)
    assert len(row.e) == dim
    for got, want in zip(row.e, expected):
        assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12), (text, dim)


# --- Z-order Morton interval: superset property on arbitrary geometry ----

_zdomain = st.tuples(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
).filter(lambda t: t[1] - t[0] > 1e-6)


@st.composite
def _zcase(draw):
    n_dims = draw(st.integers(min_value=1, max_value=3))
    specs, box, point = [], [], []
    for d in range(n_dims):
        lo, hi = sorted(draw(_zdomain))
        if hi - lo <= 1e-6:
            hi = lo + 1.0
        blo = draw(st.floats(min_value=lo, max_value=hi, allow_nan=False))
        bhi = draw(st.floats(min_value=blo, max_value=hi, allow_nan=False))
        p = draw(st.floats(min_value=blo, max_value=bhi, allow_nan=False))
        specs.append((f"c{d}", lo, hi))
        box.append((blo, bhi))
        point.append(p)
    return specs, box, point


@settings(max_examples=300, deadline=None)
@given(_zcase())
def test_zorder_interval_superset_pure(case):
    """Any point inside any box over any domain has a Morton code within
    [z(lo_corner), z(hi_corner)] — pure-python twin of the SQL key (the SQL
    vs driver quantizer agreement is tested in tests/test_zorder.py), so
    hundreds of random geometries run without a Spark job."""
    from stackai_vector_db_spark.operators.zorder import zorder_interval

    specs, box, point = case
    z_lo, z_hi = zorder_interval(specs, box)
    z_p, z_p2 = zorder_interval(specs, [(p, p) for p in point])
    assert z_p == z_p2
    assert z_lo <= z_p <= z_hi


# --- curation-op invariants (hypothesis over synthetic corpora) -----------

ids = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=4, max_size=40, unique=True
)


@settings(max_examples=6, deadline=None)
@given(ids, st.integers(min_value=1, max_value=99))
def test_domain_mix_invariants(spark, doc_ids, wa):
    """For any corpus and any two-stratum weighting: rates stay in
    [0, 1e6], quotas never exceed the binding-stratum bound, and
    n_kept <= n_in per stratum."""
    from stackai_vector_db_spark.operators.curation import domain_mix

    rows = [(i, "a" if i % 2 else "b") for i in doc_ids]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    w = {"a": wa, "b": 100 - wa}
    out = domain_mix(docs, w).collect()
    n = {r["lang"]: r["n_in"] for r in out}
    if not out:
        return
    # Binding quota over NON-EMPTY strata only, mirroring the operator's
    # (and hash-green oracle's) `n_in > 0` guard — an absent target stratum
    # keeps its row with n_in = 0, rate 0, and must not zero the quota.
    # (Hypothesis found the all-one-parity corpus where stratum 'b' is
    # empty; the old reimplementation here took min over ALL rows.)
    nn = min(v * 100 // w[k] for k, v in n.items() if v > 0)
    for r in out:
        assert 0 <= r["rate_ppm"] <= 1_000_000
        assert r["n_kept"] <= r["n_in"]
        if r["n_in"] == 0:
            assert r["rate_ppm"] == 0 and r["n_kept"] == 0
            continue
        # quota implied by the rate never exceeds the target share of N
        assert (nn * w[r["lang"]] // 100) * 1_000_000 // r["n_in"] == r["rate_ppm"]


word = st.text(alphabet="abcd", min_size=1, max_size=3)
texts = st.lists(word, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_repetition_stats_matches_pure_python(spark, tmp_path_factory, docs):
    """q_repetition_stats micro-units equal an independent pure-Python
    computation for arbitrary word streams."""
    from collections import Counter

    from stackai_vector_db_spark.queries import REGISTRY

    tmp = tmp_path_factory.mktemp("rep")
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in REGISTRY["q_repetition_stats"].fn(spark, str(tmp)).collect()
    }
    for i, t in enumerate(rows):
        ws = t[1].strip().split()
        n, nd = len(ws), len(set(ws))
        bigrams = Counter(zip(ws, ws[1:]))
        maxc = max(bigrams.values()) if bigrams else 0
        r = got[i]
        assert r["n_words"] == n
        assert r["dup_word_micro"] == (n - nd) * 1_000_000 // n
        assert r["top_bigram_micro"] == maxc * 2_000_000 // n


@settings(max_examples=6, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_span_dup_stats_matches_pure_python(spark, docs):
    """span_dup_stats equals an independent pure-Python span counter for
    arbitrary word streams (window=3 so the tiny vocab produces real
    cross-doc collisions, within-doc repeats, and excluded short docs)."""
    from stackai_vector_db_spark.operators.dedup import span_dup_stats

    w = 3
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_micro"])
        for r in span_dup_stats(df, window=w).collect()
    }

    spans = {
        i: [tuple(ws[j : j + w]) for j in range(len(ws) - w + 1)]
        for i, t in enumerate(docs)
        for ws in [t.strip().split()]
        if len(ws) >= w
    }
    docs_of = {}
    for i, ss in spans.items():
        for s in set(ss):
            docs_of.setdefault(s, set()).add(i)
    want = {}
    for i, ss in spans.items():
        n = len(ss)
        nd = sum(1 for s in ss if len(docs_of[s]) >= 2)
        want[i] = (n, nd, nd * 1_000_000 // n)
    assert got == want


_edge = st.tuples(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
).filter(lambda e: e[0] != e[1])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_edge, min_size=1, max_size=12),
    st.lists(st.integers(min_value=0, max_value=5), min_size=16, max_size=16),
)
def test_canonical_by_quality_invariants(spark, edges, scores):
    """For any pair graph and any (possibly tied) scores: exactly one
    canonical per component, the canonical attains the component's max
    score with the smallest id among the maximizers, every pair's two
    endpoints land in the same component, and only pair-touching ids are
    emitted — checked against a pure-Python union-find."""
    from stackai_vector_db_spark.operators.dedup import canonical_by_quality

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    scored = spark.createDataFrame(
        list(enumerate(scores)), "doc_id long, score_micro long"
    )
    got = canonical_by_quality(scored, pairs).collect()

    parent = list(range(16))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    members: dict[int, list[int]] = {}
    for v in touched:
        members.setdefault(find(v), []).append(v)

    assert {r["doc_id"] for r in got} == touched
    by_doc = {r["doc_id"]: r for r in got}
    for root, mem in members.items():
        comp_ids = {by_doc[v]["component_id"] for v in mem}
        assert comp_ids == {min(mem)}, "component = min reachable id"
        canon = [v for v in mem if by_doc[v]["is_canonical"]]
        best = max(scores[v] for v in mem)
        want = min(v for v in mem if scores[v] == best)
        assert canon == [want]
