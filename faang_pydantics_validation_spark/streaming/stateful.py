"""Custom stateful streaming operator: per-key violation streaks.

The engine extension for "alert when a producer keeps sending bad data":
for each key (a repo, a source, a submitter), state carried across
micro-batches accumulates totals and the CONSECUTIVE count of
micro-batches containing at least one error for that key. Expressed with
``applyInPandasWithState`` — the Arrow-batched stateful escape hatch —
because running totals across unbounded micro-batches are exactly what
windowed aggregation cannot express (no window bound) and watermarked agg
would evict.

State size is O(keys) and constant per key (4 longs), so a 100 TB ingest
with millions of producer keys holds megabytes of state per executor;
the shuffle is one hash partition by key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, batch_rows long, batch_errors long, "
    "total_rows long, total_errors long, error_streak long"
)
STATE_SCHEMA = "total_rows long, total_errors long, error_streak long"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch_rows = 0
    batch_errors = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        batch_errors += int(pdf["n_errors"].astype("int64").sum())
    if state.exists:
        total_rows, total_errors, streak = state.get
    else:
        total_rows, total_errors, streak = 0, 0, 0
    total_rows += batch_rows
    total_errors += batch_errors
    streak = streak + 1 if batch_errors > 0 else 0
    state.update((total_rows, total_errors, streak))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "batch_rows": [batch_rows],
            "batch_errors": [batch_errors],
            "total_rows": [total_rows],
            "total_errors": [total_errors],
            "error_streak": [streak],
        }
    )


def violation_streaks(annotated: DataFrame, key_col: str) -> DataFrame:
    """Streaming per-key running totals + consecutive-error-batch streak.

    ``annotated`` — the streaming frame from ``validate_stream`` (must
    carry ``n_errors``). Emits one row per key per micro-batch (append
    mode); the latest row per key is the current state snapshot.
    """
    from pyspark.sql import functions as F

    keyed = annotated.select(
        F.col(key_col).alias("key"), F.col("n_errors").cast("long").alias("n_errors")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
