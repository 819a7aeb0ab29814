"""Driver-contract invariants for the query registry (no Spark session):
sweep completeness, oracle coverage, and the rows-only allowlist. These
catch the drift class that cost rounds 1-3 driver proof: a query
registered but left out of the budgeted sweep, or silently losing its
oracle."""

from __future__ import annotations

from stackai_vector_db_spark.queries import REGISTRY, SWEEP_ORDER, _ordered

# Every id here is rows-only BY DESIGN (non-SQL-expressible) and documented
# at its @register site; anything else must carry a DuckDB oracle.
ROWS_ONLY_ALLOWED: set[str] = set(
    # EMPTY since round 9: every registered id now carries a DuckDB hash
    # oracle. The PQ family (adc/refine/ivf_pq/residual) was promoted in
    # round 5 (oracle replays the ranking math over the PERSISTED
    # codebook/code artifacts, plans/pq_index.py); q_kmeans_build followed
    # in the same round. q_approx_distinct — the last holdout, its raw HLL
    # estimate being genuinely engine-specific — was re-shaped in round 9
    # into a deterministic boundedness VERDICT (abs(approx − exact) ≤
    # ceil(3·rsd·exact)) whose exact side the oracle replays; the raw
    # estimate stays pinned in tests/test_determinism.py.
)


def test_sweep_order_is_exactly_the_registry():
    assert len(SWEEP_ORDER) == len(set(SWEEP_ORDER)), "duplicate sweep ids"
    assert set(SWEEP_ORDER) == set(REGISTRY), (
        "SWEEP_ORDER and REGISTRY must list the same query ids"
    )
    assert _ordered() == SWEEP_ORDER


def test_rows_only_set_is_closed():
    no_oracle = {n for n, qd in REGISTRY.items() if qd.oracle is None}
    assert no_oracle == ROWS_ONLY_ALLOWED, (
        f"rows-only drift: unexpected={sorted(no_oracle - ROWS_ONLY_ALLOWED)} "
        f"regained-oracle={sorted(ROWS_ONLY_ALLOWED - no_oracle)}"
    )


def test_bench_headline_names_are_registered():
    """bench.py's HEADLINE list must name real registry ids — the bench
    loop skips unknown names silently (REGISTRY.get → continue), so a
    renamed query would quietly drop out of the recorded BENCH total and
    read as a speedup."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    # bench.py setdefaults SPARK_DRIVER_MEMORY=24g at import time (its heap
    # pin); snapshot/restore the environment so a Spark session created
    # later in this pytest process doesn't inherit a bench-sized heap on a
    # smaller host (round-6 advisor).
    env_before = os.environ.copy()
    try:
        spec.loader.exec_module(bench)
    finally:
        os.environ.clear()
        os.environ.update(env_before)
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"HEADLINE names not in REGISTRY: {missing}"


def test_unproven_ids_lead_the_sweep():
    """The driver records at most 50 correctness rows per round; the ids
    whose latest driver row is OLDEST must sit inside the budget (proof
    freshness — no id's row should be more than one round stale). "One
    round stale" means every id appears in the UNION of the last TWO
    CORRECTNESS_r*.json files — checking only the newest file would go
    red the instant the driver emits a round file (it contains exactly
    the top-50, so every rotated-out id would "fail" despite having a
    one-round-old row). Globbing (not a pinned path) tracks rounds — the
    r4-judge wart was a hardcoded r03 that silently approved a stale
    ordering. If this fails after editing SWEEP_ORDER, rotate the ids it
    names into the top 50."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        return
    fresh: set = set()
    for path in files[-2:]:
        with open(path) as f:
            fresh |= set(json.load(f))
    top50 = set(SWEEP_ORDER[:50])
    missing = [q for q in SWEEP_ORDER if q not in fresh and q not in top50]
    assert not missing, (
        f"ids with no row in the last two correctness files "
        f"({[os.path.basename(p) for p in files[-2:]]}) sit past the "
        f"50-row budget: {missing}"
    )
