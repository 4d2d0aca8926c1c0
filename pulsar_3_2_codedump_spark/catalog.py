"""Fixture catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _conform_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to session-local TIMESTAMP.

    The driver regenerates fixtures with ``isAdjustedToUTC=false`` parquet
    timestamps, which PySpark 4.x (inferTimestampNTZ) reads as
    ``TimestampNTZType`` — a type ``unix_micros``/watermarks reject.  The
    session timezone is pinned to UTC (session.py), so the cast is
    value-preserving and the DuckDB oracle (which reads the same parquet
    naively) still hash-matches.  One projection, applied at the read
    boundary — nothing downstream ever sees NTZ."""
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if not ntz:
        return df
    return df.select(
        *[F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c) for c in df.columns]
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes timestamp representations the
    fixtures have shipped with across driver versions — nanosecond
    TIMESTAMP(NANOS) (readable only as long) and tz-naive TIMESTAMP_NTZ —
    down to plain session-TZ microsecond TIMESTAMP, matching what DuckDB's
    reader produces on the same files."""
    try:
        # Prefer reading tz-naive parquet timestamps as TIMESTAMP directly;
        # the cast below still guards sessions where this conf is absent/locked.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _conform_timestamps(df)
    return _conform_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each fixture table as a temp view (matches the driver's
    duckdb-side pre-registered views, so the same SQL names work)."""
    for name in tables or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def fanout(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition before expression-heavy per-row work.

    The fixtures are single-row-group parquet files, which Spark scans with
    ONE task; anything computing per-row kernels (md5 shingles, dot products)
    right after the scan would run single-threaded. A cheap round-robin
    exchange of the raw rows buys full-core parallelism for the expensive
    projection. At 100 TB inputs arrive as many splits and this becomes a
    no-op decision — keep data small when it fans out, never collect it.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def ckpt_unless_plan_only(df: DataFrame) -> DataFrame:
    """localCheckpoint in product runs; identity under SPARK_GRAFT_PLAN_ONLY.

    The persist-before-reuse discipline (rfm_scores' shared base,
    token_budget_selection's tokenized projection, ivfpq's residual
    assignment): a frame consumed by several downstream branches is
    materialized once instead of re-executed per reference. localCheckpoint
    is EAGER — it runs a job at DataFrame construction — so planning-only
    sweeps (the flip audit, tools/broadcast_audit.py) set
    SPARK_GRAFT_PLAN_ONLY and get the lazy frame back unchanged: identical
    rows, un-materialized, plan shape preserved for the boundedness
    classifier."""
    import os

    if os.environ.get("SPARK_GRAFT_PLAN_ONLY"):
        return df
    return df.localCheckpoint()
