"""Delayed delivery as a stateful streaming operator (SURVEY §2.F1/F2 — the
hardest custom piece, §7 M5).

Reference: messages carrying ``deliver_at_time`` (PulsarApi.proto:143) are
held by the broker in a delayed-delivery tracker — an in-memory priority
queue of (ledger, entry, deliverAt) triples released when due
(pulsar-broker/.../delayed/InMemoryDelayedDeliveryTracker.java:34,70,117);
the bucketed variant spills snapshots to BookKeeper
(bucket/BucketDelayedDeliveryTracker.java) for huge backlogs.

Spark re-expression: ``applyInPandasWithState`` keyed by topic partition.
State = the buffered not-yet-due rows (the "bucket"); the event-time timeout
fires on watermark advance and releases everything due. Spark's state store
(RocksDB in production) plays BookKeeper's role for spill/recovery — the
bucketed tracker comes free. The batch oracle for this operator is
``delayed_delivery_due`` (operators/timeops.py): replaying a bounded stream
through this operator must converge to that visibility predicate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
    IntegerType,
    StringType,
)

RELEASED_SCHEMA = StructType(
    [
        StructField("partition", IntegerType()),
        StructField("key", StringType()),
        StructField("sequence_id", LongType()),
        StructField("deliver_at", TimestampType()),
        StructField("released_at_watermark", TimestampType()),
    ]
)

# state: buffered pending rows as TYPED parallel arrays (the tracker's
# priority-queue contents; BucketDelayedDeliveryTracker snapshots are the
# reference analogue of the state store holding this between batches)
STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("seqs", ArrayType(LongType())),
        StructField("deliver_ats", ArrayType(LongType())),  # epoch micros
    ]
)


def _release(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fully vectorized release: pandas/numpy column ops end to end — no
    iterrows, no per-row Python. A 100k-row pending backlog is three numpy
    masks, exactly the posture a big BucketDelayedDeliveryTracker backlog
    needs."""
    partition = int(key[0])
    # current watermark (== the broker's clock for due-ness)
    wm_ms = state.getCurrentWatermarkMs()

    chunks_keys: list[np.ndarray] = []
    chunks_seqs: list[np.ndarray] = []
    chunks_due: list[np.ndarray] = []
    if state.exists:
        (k_arr, s_arr, d_arr) = state.get
        if k_arr:
            chunks_keys.append(np.asarray(k_arr, dtype=object))
            chunks_seqs.append(np.asarray(s_arr, dtype=np.int64))
            chunks_due.append(np.asarray(d_arr, dtype=np.int64))

    for pdf in pdfs:
        if not len(pdf):
            continue
        due = pdf["deliver_at"].fillna(pdf["publish_time"])
        chunks_keys.append(pdf["key"].astype(str).to_numpy(dtype=object))
        chunks_seqs.append(pdf["sequence_id"].to_numpy(dtype=np.int64))
        chunks_due.append(
            pd.to_datetime(due).astype("datetime64[us]").to_numpy().astype(np.int64)
        )

    keys = np.concatenate(chunks_keys) if chunks_keys else np.empty(0, dtype=object)
    seqs = np.concatenate(chunks_seqs) if chunks_seqs else np.empty(0, dtype=np.int64)
    due_us = np.concatenate(chunks_due) if chunks_due else np.empty(0, dtype=np.int64)

    due_mask = (due_us <= wm_ms * 1000) if wm_ms > 0 else np.zeros(len(due_us), dtype=bool)
    keep = ~due_mask

    if keep.any():
        state.update((keys[keep].tolist(), seqs[keep].tolist(), due_us[keep].tolist()))
        # wake when the watermark can next release something
        state.setTimeoutTimestamp(int(due_us[keep].min()) // 1000 + 1)
    else:
        state.remove()

    if due_mask.any():
        wm = pd.Timestamp(wm_ms * 1000, unit="us")
        yield pd.DataFrame(
            {
                "partition": np.full(int(due_mask.sum()), partition, dtype=np.int32),
                "key": keys[due_mask],
                "sequence_id": seqs[due_mask],
                "deliver_at": pd.to_datetime(due_us[due_mask], unit="us"),
                "released_at_watermark": wm,
            }
        )


def delayed_delivery(env_stream: DataFrame, watermark_lag: str = "0 seconds") -> DataFrame:
    """Hold envelope rows until their deliver_at has passed the event-time
    watermark; emit release records. Immediate rows (deliver_at null) pass
    on the next watermark tick."""
    return (
        env_stream.withWatermark("publish_time", watermark_lag)
        .select("partition", "key", "sequence_id", "publish_time", "deliver_at")
        .groupBy("partition")
        .applyInPandasWithState(
            _release,
            outputStructType=RELEASED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
