"""Custom stateful streaming operator: latest-state-per-key.

The continuous counterpart of the SCD2 'current row' maintenance
(``operators/scd2.py``): each key keeps its newest event (event-time
ordered, late events ignored — the reference's I4 guard,
``section_58.py:349-353``) across micro-batches via
``applyInPandasWithState``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ts_us LONG, event_type STRING, props STRING"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("props", T.StringType()),
    ]
)


def _update_latest(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    best_ts, best_type, best_props = (
        state.get if state.exists else (None, None, None)
    )
    for pdf in pdfs:
        for _, r in pdf.iterrows():
            ts_us = int(r["ts_us"])
            if best_ts is None or ts_us > best_ts:  # I4: latest wins, late ignored
                best_ts, best_type, best_props = ts_us, r["event_type"], r["props"]
    state.update((best_ts, best_type, best_props))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ts_us": [best_ts],
            "event_type": [best_type],
            "props": [best_props],
        }
    )


def latest_state_per_key(stream: DataFrame) -> DataFrame:
    """Input stream columns: user_id, ts_us, event_type, props.

    Emits the per-key latest state each micro-batch (update mode).
    """
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_latest,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
