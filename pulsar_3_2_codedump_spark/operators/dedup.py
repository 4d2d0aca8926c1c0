"""Message deduplication (SURVEY §2.E).

Reference: broker-side dedup rejects a message when its ``sequence_id`` is
≤ the highest sequence already persisted for that ``producer_name``
(pulsar-broker/.../persistent/MessageDeduplication.java:52,104-113,325
``isDuplicate``; hooked into the publish path at PersistentTopic.java:536).

Spark re-expression:
  - batch: ``dropDuplicates(producer_name, sequence_id)`` / keep-max-seq —
    a single hash-agg shuffle on the dedup identity.
  - streaming: ``withWatermark().dropDuplicates(...)`` (bounded state).
At 100 TB the dedup identity (producer, seq) is high-cardinality and evenly
spread — hash-partitioned agg scales linearly; no global ordering needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import EVENTS_ENVELOPE_ORACLE, cached_envelope
from pulsar_3_2_codedump_spark.queries import query

_ENV = f"WITH envelope AS ({EVENTS_ENVELOPE_ORACLE})"


def dedup_exact(env: DataFrame) -> DataFrame:
    """Drop exact redeliveries: one row per (producer_name, sequence_id)."""
    return env.dropDuplicates(["producer_name", "sequence_id"])


def dedup_highest_sequence(env: DataFrame) -> DataFrame:
    """Per-producer high-water mark, the state MessageDeduplication snapshots
    (``highestSequencedPushed``)."""
    return env.groupBy("producer_name").agg(
        F.max("sequence_id").alias("highest_sequence_id"),
        F.count(F.lit(1)).alias("n_messages"),
    )


@query(
    "dedup_producer_sequence",
    section="2.E1",
    doc="Broker dedup identity (MessageDeduplication.isDuplicate :325): distinct "
    "(producer_name, sequence_id) row count per producer — duplicates collapse.",
    oracle=f"""
        {_ENV}
        SELECT producer_name, COUNT(*) AS n_messages, MAX(sequence_id) AS highest_sequence_id
        FROM (SELECT DISTINCT producer_name, sequence_id FROM envelope)
        GROUP BY producer_name
    """,
)
def dedup_producer_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    # replay duplicates: every 10th message is "sent twice" (simulating a
    # producer retry after a dropped receipt) — dedup must collapse them
    dup = env.filter(F.col("sequence_id") % 10 == 0)
    replayed = env.unionByName(dup)
    d = dedup_exact(replayed)
    return d.groupBy("producer_name").agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.max("sequence_id").alias("highest_sequence_id"),
    )
