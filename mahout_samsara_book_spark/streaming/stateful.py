"""Custom stateful streaming operator via ``applyInPandasWithState``
(north star: 'applyInPandasWithState for custom stateful operators').

Running per-key totals that survive across micro-batches: the state store
carries (count, total_value) per event_type; every batch folds its rows
into the state and emits the updated running aggregate. This is the
minimal template for arbitrary custom state (sketches, session models,
online learners) — swap the fold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, n long, total_value double"
STATE_SCHEMA = "n long, total_value double"


def _update(key, pdf_iter, state: GroupState):
    (etype,) = key
    if state.exists:
        n, tot = state.get
    else:
        n, tot = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        tot += float(pdf["value"].sum())
    state.update((n, tot))
    yield pd.DataFrame(
        {"event_type": [etype], "n": [n], "total_value": [tot]}
    )


def start_running_totals(
    ev_stream: DataFrame, out_path: str, checkpoint_path: str
) -> StreamingQuery:
    """Per-event_type running (count, Σvalue) across micro-batches;
    each epoch's updated rows append to ``out_path`` parquet tagged with
    the epoch id (latest epoch per key = current state)."""
    updated = ev_stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import functions as F

        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_path)

    return (
        updated.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
