"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming aggregations cover windows/sessions/dedup
(streaming/events.py); this is the escape hatch for state machines they
can't express — here a per-user running profile (event count, value
total, last-seen timestamp) that a feature store or abuse detector
would maintain.

Scale: state is partitioned by the group key across executors; each
microbatch touches only the keys present in it. The Python boundary is
Arrow-batched per group — acceptable here because state transition
logic is genuinely imperative; everything upstream/downstream stays
JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts long"


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            batch_max_us = int(pdf["ts"].max().value // 1000)
            last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": total,
                "last_ts": pd.Timestamp(last_us * 1000),
            }
        ]
    )


def user_running_totals(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Running per-user profile, one updated row per user per
    microbatch (``update`` output mode)."""
    return (
        events.select(user_col, "value", "ts")
        .groupBy(user_col)
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
