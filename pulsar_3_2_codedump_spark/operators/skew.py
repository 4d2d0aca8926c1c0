"""Skew handling: salted aggregation and salted broadcast-join patterns.

At 100 TB the hash-partitioned per-key operators (compaction, TableView,
Key_Shared) meet real-world key skew — one hot user/tenant key lands an
entire partition on one executor. Two standing remedies, both declarative:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
   session.py) — handles join-side skew at runtime with no code change.
2. Salting (below) — for aggregations: two-phase partial→final agg over a
   salted key. The salt fans one hot key across N reducers, then the final
   agg un-salts. The oracle proves the result is IDENTICAL to the unsalted
   group-by — the rewrite changes the plan, never the answer.

The reference has the analogous problem in Key_Shared dispatch (one hot key
serializes on one consumer, ConsistentHashingStickyKeyConsumerSelector) and
no remedy — per-key ordering forbids splitting a key. We get to split
because aggregation doesn't need per-key ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import EVENTS_ENVELOPE_ORACLE, wrap_events
from pulsar_3_2_codedump_spark.queries import query

_ENV = f"WITH envelope AS ({EVENTS_ENVELOPE_ORACLE})"

DEFAULT_SALT = 16


def salted_count_sum(
    df: DataFrame, key_col: str, val_col: str, unique_col: str, salt: int = DEFAULT_SALT
) -> DataFrame:
    """count + sum per key via explicit two-phase salting (deterministic salt =
    hash of a unique column, so replays salt identically)."""
    phase1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt)))
        .groupBy(key_col, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(val_col).alias("__s"))
    )
    return phase1.groupBy(key_col).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("total")
    )


@query(
    "salted_hot_key_agg",
    section="2.B3-skew",
    doc="Skew-safe aggregation: per-key message count + value sum computed via a "
    "16-way salted two-phase agg; result provably identical to the plain "
    "group-by (the oracle IS the plain group-by).",
    oracle=f"""
        {_ENV}
        SELECT key, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM envelope GROUP BY key
    """,
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    env = wrap_events(ev).join(
        ev.select(F.col("event_id").alias("sequence_id"), F.col("value").alias("ev_value")),
        "sequence_id",
    )
    out = salted_count_sum(env, "key", "ev_value", unique_col="sequence_id")
    return out.select("key", "n", F.round("total", 2).alias("total"))
