"""Subscription types as query topologies (SURVEY §2.J1).

Reference (pulsar-client-api/.../api/SubscriptionType.java:33-61, dispatchers
PersistentDispatcherSingleActiveConsumer / MultipleConsumers /
StickyKeyDispatcher):

  - Exclusive: one consumer owns the whole topic.
  - Failover: one ACTIVE consumer; a standby takes over on failure.
  - Shared: work-queue — messages spread round-robin over N consumers,
    no ordering guarantee.
  - Key_Shared: N consumers, each owning a hash range of keys; per-key order.

Spark re-expression: a "consumer" is a streaming query with a checkpoint.
  - Exclusive/Failover = ONE query; failover is the checkpoint itself — the
    replacement query resumes from the same checkpoint (same subscription).
  - Shared = N queries, each assigned a partition subset (work-queue split;
    the driver-side analogue of round-robin dispatch at entry granularity —
    we split at partition granularity, which also preserves per-partition
    order, strictly stronger than Pulsar's Shared).
  - Key_Shared = partition-subset assignment where routing already co-located
    keys (operators/routing.key_shared_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark import topic as T


def exclusive(spark: SparkSession, topic_path: str) -> DataFrame:
    """Exclusive/Failover: the single consumer's stream. Failover = start the
    same thing with the same checkpoint elsewhere."""
    return spark.readStream.format("pulsarlike").option("path", topic_path).load()


def shared(spark: SparkSession, topic_path: str, n_consumers: int) -> list[DataFrame]:
    """Shared (work-queue): partition-granular assignment — consumer i gets
    partitions p where p % n == i. Disjoint and exhaustive."""
    src = exclusive(spark, topic_path)
    return [
        src.filter(F.col("partition") % n_consumers == i) for i in range(n_consumers)
    ]


def key_shared(spark: SparkSession, topic_path: str, n_consumers: int) -> list[DataFrame]:
    """Key_Shared: same split, but consumers rely on the producer's key
    routing — all messages of one key live in one partition, so per-key order
    is preserved within each consumer's stream."""
    return shared(spark, topic_path, n_consumers)


def subscription_position(checkpoint_dir: str) -> dict[str, int] | None:
    """Inspect a subscription's committed cursor (markDeletePosition analogue)
    from the Structured Streaming offset log."""
    import json
    import os

    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    if not os.path.isdir(offsets_dir):
        return None
    batches = sorted(int(f) for f in os.listdir(offsets_dir) if f.isdigit())
    if not batches:
        return None
    with open(os.path.join(offsets_dir, str(batches[-1]))) as f:
        lines = f.read().strip().splitlines()
    # v1 offset log: line 0 = version, line 1 = metadata, line 2+ = per-source offsets
    try:
        return json.loads(lines[-1])
    except (ValueError, IndexError):
        return None
