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

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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

# state: buffered pending rows, serialized as parallel lists
STATE_SCHEMA = StructType(
    [
        StructField("keys", StringType()),          # '\x1f'-joined
        StructField("seqs", StringType()),          # csv of longs
        StructField("deliver_ats", StringType()),   # csv of epoch micros
    ]
)


def _release(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import datetime as dt

    partition = int(key[0])
    # current watermark (== the broker's clock for due-ness)
    wm_ms = state.getCurrentWatermarkMs()
    wm = dt.datetime.utcfromtimestamp(wm_ms / 1e3) if wm_ms > 0 else None

    pend_keys: list[str] = []
    pend_seqs: list[int] = []
    pend_due: list[int] = []
    if state.exists:
        (k_str, s_str, d_str) = state.get
        if k_str:
            pend_keys = k_str.split("\x1f")
            pend_seqs = [int(x) for x in s_str.split(",")]
            pend_due = [int(x) for x in d_str.split(",")]

    for pdf in pdfs:
        for _, row in pdf.iterrows():
            due = row["deliver_at"] if not pd.isna(row["deliver_at"]) else row["publish_time"]
            pend_keys.append(str(row["key"]))
            pend_seqs.append(int(row["sequence_id"]))
            pend_due.append(int(pd.Timestamp(due).value // 1000))  # micros

    released, keep = [], ([], [], [])
    for k, s, d in zip(pend_keys, pend_seqs, pend_due):
        due_ts = dt.datetime.utcfromtimestamp(d / 1e6)
        if wm is not None and due_ts <= wm:
            released.append((partition, k, s, due_ts, wm))
        else:
            keep[0].append(k), keep[1].append(str(s)), keep[2].append(str(d))

    if keep[0]:
        state.update(("\x1f".join(keep[0]), ",".join(keep[1]), ",".join(keep[2])))
        # wake when the watermark can next release something
        state.setTimeoutTimestamp(min(int(x) for x in keep[2]) // 1000 + 1)
    else:
        state.remove()

    if released:
        yield pd.DataFrame(
            released,
            columns=["partition", "key", "sequence_id", "deliver_at", "released_at_watermark"],
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
