"""Streaming operators exposed to the driver's correctness harness.

These run a REAL bounded Structured Streaming pipeline (topic → pulsarlike
source → stateful operator → collected result) inside the query callable and
return the result as a DataFrame. They are genuinely non-SQL-expressible
(stateful timers / counters across micro-batches), so no ``oracle`` is
declared — the driver records the weaker rows-only check (SURVEY §5). The
strong checks live in tests/test_streaming_ops.py, which assert these same
pipelines against batch oracles.

Determinism: fixture replay + availableNow triggers + event-time watermarks
⇒ identical output rows on every run.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from pulsar_3_2_codedump_spark.queries import query


def _replay_topic(spark: SparkSession, sf_dir: str, root: str, lo: int, hi: int) -> str:
    tp = T.create_topic(root, "q", n_partitions=2)
    env = (
        wrap_events(load(spark, sf_dir, "events"))
        .filter(F.col("sequence_id").between(lo, hi - 1))
        .drop("partition", "offset")
    )
    T.append(spark, env, tp)
    return tp


def _run_bounded(stream_df, checkpoint: str, runs_with_appends) -> list:
    """Run an availableNow query once per growth step, collecting appended output."""
    out: list = []

    def grab(batch, _bid):
        out.extend(batch.collect())

    for append_fn in runs_with_appends:
        if append_fn:
            append_fn()
        q = (
            stream_df.writeStream.foreachBatch(grab)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return out


@query(
    "streaming_delayed_delivery",
    section="2.F1-stream",
    doc="LIVE stateful streaming: delayed-delivery timers over a bounded replay "
    "(two micro-batch generations; watermark of gen-1 releases its due messages "
    "in gen-2). Non-SQL-expressible → rows-only check; the exact-match oracle "
    "is tests/test_streaming_ops.py::test_delayed_delivery_releases_due_messages.",
    oracle=None,
)
def streaming_delayed_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_3_2_codedump_spark.sources import register
    from pulsar_3_2_codedump_spark.streaming.delayed import delayed_delivery

    register(spark)
    root = tempfile.mkdtemp(prefix="sdq_")
    try:
        tp = _replay_topic(spark, sf_dir, root, 0, 300)
        src = spark.readStream.format("pulsarlike").option("path", tp).load()
        released = delayed_delivery(src)

        def grow():
            env = (
                wrap_events(load(spark, sf_dir, "events"))
                .filter(F.col("sequence_id").between(300, 399))
                .drop("partition", "offset")
            )
            T.append(spark, env, tp)

        rows = _run_bounded(released, root + "/ck", [None, grow])
        out = spark.createDataFrame(rows, released.schema) if rows else spark.createDataFrame([], released.schema)
        return out.select(
            "partition", "key", "sequence_id",
            F.date_format("deliver_at", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("deliver_at"),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "streaming_count_windows",
    section="2.G2-stream",
    doc="LIVE stateful streaming: count-based tumbling windows (stateful counter "
    "per key) over a bounded replay. Non-SQL-expressible → rows-only check; "
    "exact-match oracle in tests/test_streaming_ops.py::test_count_window_matches_batch_oracle.",
    oracle=None,
)
def streaming_count_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_3_2_codedump_spark.sources import register
    from pulsar_3_2_codedump_spark.streaming.function_runtime import count_window_function

    register(spark)
    root = tempfile.mkdtemp(prefix="scq_")
    try:
        tp = _replay_topic(spark, sf_dir, root, 0, 400)
        src = spark.readStream.format("pulsarlike").option("path", tp).load()
        wins = count_window_function(src, n=50, key_col="producer_name", seq_col="sequence_id")
        rows = _run_bounded(wins, root + "/ck", [None])
        return (
            spark.createDataFrame(rows, wins.schema)
            if rows
            else spark.createDataFrame([], wins.schema)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
