"""Custom stateful streaming operators (applyInPandasWithState).

Where windows/sessions/dedup (pipeline.py) cover the declarative state
shapes, this module is the escape hatch for operator semantics Spark
has no built-in for — per-key accumulators that survive across
micro-batches with explicit timeout-based eviction. State lives in
Spark's state store (checkpointed, partitioned by key), the per-batch
work arrives as Arrow batches, and nothing ever collects to the
driver.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def make_running_totals_update(value_col: str, idle_timeout_ms: Optional[int]):
    """The applyInPandasWithState update function, exposed for direct
    unit-testing of the eviction branch (see running_totals on why the
    timeout path can't be driven end-to-end under availableNow)."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})

    return update


def running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    idle_timeout_ms: Optional[int] = 30 * 60 * 1000,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits one updated row per key per micro-batch the key appears in;
    keys idle past ``idle_timeout_ms`` of processing time are evicted
    (bounded state — the streaming analogue of "no unbounded hash
    table"). Output mode must be ``update``.

    ``idle_timeout_ms=None`` disables eviction (NoTimeout). REQUIRED
    for availableNow/file-replay runs: with ProcessingTimeTimeout,
    Spark's drain loop keeps scheduling empty micro-batches while any
    processing-time timer exists, so an availableNow query NEVER
    terminates (measured: a 3 s timeout still spins empty batches past
    120 s). A continuous production stream keeps the timeout — batches
    arrive anyway and eviction bounds the state; the eviction branch
    itself is unit-tested via make_running_totals_update."""

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            make_running_totals_update(value_col, idle_timeout_ms),
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if idle_timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
