"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps per-library mutable state (dirty counters,
``index_service.py:163-196``) guarded by locks; in Structured Streaming the
analogous pattern is explicit keyed state in the state store. This module
implements the canonical form — per-key running totals that survive across
micro-batches — as the template for any custom accumulator (per-library
ingest counters, per-user quotas, sessionized feature state).

Scale notes: state is partitioned by the grouping key across executors and
checkpointed by the engine; per-key state here is O(1) (two numbers), the
only safe size class at 100 TB input. Batch parity is asserted in
tests/test_streaming.py (final state == batch groupBy aggregate).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n": [n], "sum_value": [round(s, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state;
    emits the updated totals for every key seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
