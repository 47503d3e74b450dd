"""Custom stateful streaming operator: per-sample pipeline-status
tracking via ``applyInPandasWithState``.

The reference keeps one mutable SQLite row per sample, UPDATEd after
every stage (tools.py:28-56 all_log; DDL :19-22). As a stream that is
a keyed running state: each micro-batch of stage events updates the
sample's state (stages seen, latest stage/status, failure flag) and
emits the refreshed row. State lives in Spark's checkpointed state
store — per-key, partitioned by the grouping key, so 10^9 samples
shard across executors instead of one SQLite file.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATUS_OUT = StructType(
    [
        StructField("sample_id", StringType()),
        StructField("n_events", LongType()),
        StructField("last_stage", StringType()),
        StructField("last_status", StringType()),
        StructField("failed", BooleanType()),
    ]
)

# State: (n_events, last_stage, last_status, failed)
STATUS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_stage", StringType()),
        StructField("last_status", StringType()),
        StructField("failed", BooleanType()),
    ]
)


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (sample_id,) = key
    n, last_stage, last_status, failed = (
        state.get if state.exists else (0, None, None, False)
    )
    for pdf in pdfs:
        # Event order within a batch follows ts then stage (stable
        # tie-break) — the reference applies stage updates in sequence.
        pdf = pdf.sort_values(["ts", "stage"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            n += 1
            last_stage = row.stage
            last_status = row.status
            failed = failed or (row.status == "failed")
    state.update((n, last_stage, last_status, failed))
    yield pd.DataFrame(
        {
            "sample_id": [sample_id],
            "n_events": [n],
            "last_stage": [last_stage],
            "last_status": [last_status],
            "failed": [failed],
        }
    )


def sample_status_stream(events: DataFrame) -> DataFrame:
    """Streaming per-sample status: input columns
    (sample_id, stage, status, ts); one refreshed status row per
    sample per micro-batch in which it appears. Exactly the
    reference's UPDATE-one-wide-row semantics, with the state store
    replacing SQLite."""
    return events.groupBy("sample_id").applyInPandasWithState(
        _track,
        outputStructType=STATUS_OUT,
        stateStructType=STATUS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
