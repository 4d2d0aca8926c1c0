"""Data-layout operators — Z-order clustering and its skipping payoff.

At 100 TB the dominant cost is which FILES a query must open; engines
cluster tables on a space-filling curve (Delta OPTIMIZE ZORDER, Iceberg
sort orders, Hudi clustering) so multi-dimensional predicates prune by
file min/max statistics. This operator makes that payoff AUDITABLE as a
query: it lays the orders table out twice — lexicographically by date and
along a 2-D Z-order curve over (order day, price cents) — computes each
layout's per-file min/max footer stats, and counts how many files a fixed
2-D probe rectangle must open under each. Everything is EXACT INTEGER
arithmetic (days since epoch, price in cents, 10-bit rank normalization,
bit interleaving as DIV/mod sums), so both engines agree bit-for-bit.

The Z-index is the classic Morton code: normalize each dimension to a
10-bit rank, interleave bits. File assignment slices the curve into equal
Z-ranges; the lexicographic baseline slices the date rank the same way.
The output row pair IS the exhibit: same probe, same file count, fewer
files hit under Z-order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import query

Z_BITS = 10        # per-dimension rank bits
Z_FILES = 32       # files per layout


def _interleave_sql(r1: str, r2: str) -> str:
    """Morton interleave of two Z_BITS-bit ranks as pure integer arithmetic
    (identical text in Spark SQL and DuckDB modulo the DIV spelling the
    caller substitutes)."""
    terms = []
    for i in range(Z_BITS):
        p = 1 << i
        terms.append(f"(({r1}) DIV {p}) % 2 * {4 ** i}")
        terms.append(f"(({r2}) DIV {p}) % 2 * {2 * 4 ** i}")
    return " + ".join(terms)


_Z_RANGE = 1 << (2 * Z_BITS)          # z-index space
_Z_SLICE = _Z_RANGE // Z_FILES        # z-range per file
_LEX_SLICE = (1 << Z_BITS) // Z_FILES # date-rank range per file


@query(
    "zorder_data_skipping",
    section="2.M-layout",
    doc="Z-order clustering payoff audit (Delta OPTIMIZE ZORDER / Iceberg "
    "sort-order semantics, Morton curve): lay orders out lexicographically "
    "by date vs along the 2-D Z-curve over (order day, price cents), "
    "compute per-file min/max footer stats for both dimensions, and count "
    "the files a fixed 2-D probe rectangle (middle quintile of each "
    "dimension) must open under each layout. All integer arithmetic "
    "(10-bit rank normalization, DIV/mod bit interleave) — bit-exact on "
    "both engines. Two output rows: same files, same probe; Z-order opens "
    "fewer.",
    oracle=f"""
        WITH base AS (
            SELECT CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT) AS dd,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
            FROM orders
        ),
        st AS (
            SELECT MIN(dd) AS mn1, MAX(dd) AS mx1,
                   MIN(pc) AS mn2, MAX(pc) AS mx2
            FROM base
        ),
        ranked AS (
            SELECT dd, pc,
                   ((dd - st.mn1) * {1 << Z_BITS}) // (st.mx1 - st.mn1 + 1) AS r1,
                   ((pc - st.mn2) * {1 << Z_BITS}) // (st.mx2 - st.mn2 + 1) AS r2
            FROM base, st
        ),
        filed AS (
            SELECT dd, pc,
                   ({_interleave_sql("r1", "r2").replace(" DIV ", " // ")})
                       // {_Z_SLICE} AS zfile,
                   r1 // {_LEX_SLICE} AS lexfile
            FROM ranked
        ),
        layouts AS (
            SELECT 'zorder' AS layout, zfile AS f, dd, pc FROM filed
            UNION ALL
            SELECT 'lexicographic', lexfile, dd, pc FROM filed
        ),
        stats AS (
            SELECT layout, f, COUNT(*) AS n_rows,
                   MIN(dd) AS lo1, MAX(dd) AS hi1,
                   MIN(pc) AS lo2, MAX(pc) AS hi2
            FROM layouts GROUP BY layout, f
        ),
        probe AS (
            SELECT st.mn1 + (st.mx1 - st.mn1) * 2 // 5 AS p1lo,
                   st.mn1 + (st.mx1 - st.mn1) * 3 // 5 AS p1hi,
                   st.mn2 + (st.mx2 - st.mn2) * 2 // 5 AS p2lo,
                   st.mn2 + (st.mx2 - st.mn2) * 3 // 5 AS p2hi
            FROM st
        )
        SELECT s.layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN s.lo1 <= p.p1hi AND s.hi1 >= p.p1lo
                              AND s.lo2 <= p.p2hi AND s.hi2 >= p.p2lo
                             THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
               CAST(SUM(CASE WHEN s.lo1 <= p.p1hi AND s.hi1 >= p.p1lo
                              AND s.lo2 <= p.p2hi AND s.hi2 >= p.p2lo
                             THEN s.n_rows ELSE 0 END) AS BIGINT)
                   AS rows_scanned
        FROM stats s, probe p
        GROUP BY s.layout
    """,
)
def zorder_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("dd"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    st = base.agg(
        F.min("dd").alias("mn1"), F.max("dd").alias("mx1"),
        F.min("pc").alias("mn2"), F.max("pc").alias("mx2"),
    )
    ranked = base.crossJoin(F.broadcast(st)).select(
        "dd", "pc",
        F.expr(f"((dd - mn1) * {1 << Z_BITS}) DIV (mx1 - mn1 + 1)").alias("r1"),
        F.expr(f"((pc - mn2) * {1 << Z_BITS}) DIV (mx2 - mn2 + 1)").alias("r2"),
    )
    filed = ranked.select(
        "dd", "pc",
        F.expr(f"({_interleave_sql('r1', 'r2')}) DIV {_Z_SLICE}").alias("zfile"),
        F.expr(f"r1 DIV {_LEX_SLICE}").alias("lexfile"),
    )
    both = filed.select(
        F.lit("zorder").alias("layout"), F.col("zfile").alias("f"), "dd", "pc"
    ).unionAll(
        filed.select(
            F.lit("lexicographic").alias("layout"),
            F.col("lexfile").alias("f"), "dd", "pc",
        )
    )
    stats = both.groupBy("layout", "f").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("dd").alias("lo1"), F.max("dd").alias("hi1"),
        F.min("pc").alias("lo2"), F.max("pc").alias("hi2"),
    )
    probe = st.select(
        F.expr("mn1 + (mx1 - mn1) * 2 DIV 5").alias("p1lo"),
        F.expr("mn1 + (mx1 - mn1) * 3 DIV 5").alias("p1hi"),
        F.expr("mn2 + (mx2 - mn2) * 2 DIV 5").alias("p2lo"),
        F.expr("mn2 + (mx2 - mn2) * 3 DIV 5").alias("p2hi"),
    )
    hit = (
        (F.col("lo1") <= F.col("p1hi")) & (F.col("hi1") >= F.col("p1lo"))
        & (F.col("lo2") <= F.col("p2hi")) & (F.col("hi2") >= F.col("p2lo"))
    )
    return (
        stats.crossJoin(F.broadcast(probe))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("files_hit"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("long").alias(
                "rows_scanned"
            ),
        )
    )


COMPACT_TARGET_BYTES = 16_384  # target compacted segment size (scaled to fixtures)
_ROW_OVERHEAD = 48             # per-row envelope overhead added to payload length


@query(
    "segment_compaction_plan",
    section="2.F4",
    doc="Small-segment compaction PLANNER (the managed-ledger maintenance "
    "the reference runs as ManagedLedgerImpl's ledger rollover/trim and "
    "lakehouse engines run as Iceberg binPack / Delta OPTIMIZE): hourly "
    "segments per event_type are sized (payload bytes + fixed row "
    "overhead, all integer), then greedily packed into contiguous "
    f"~{COMPACT_TARGET_BYTES}-byte rewrite groups by slicing the "
    "EXCLUSIVE running-byte prefix at target boundaries — bin_id = "
    "cum_before DIV target. The prefix sum is a window PARTITIONED BY "
    "event_type ordered by the (unique) hour — per-topic state, no "
    "global window; the plan output is bounded by total-bytes/target, "
    "not row count. Cites ManagedLedgerImpl.java rollover + "
    "internalTrimLedgers for the maintenance semantics.",
    oracle=f"""
        WITH seg AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(SUM(length(props) + {_ROW_OVERHEAD}) AS BIGINT) AS bytes,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM events GROUP BY 1, 2
        ),
        c AS (
            SELECT *,
                   COALESCE(SUM(bytes) OVER (PARTITION BY event_type ORDER BY h
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS cum_before
            FROM seg
        )
        SELECT event_type,
               CAST(cum_before // {COMPACT_TARGET_BYTES} AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
               CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
               STRFTIME(MIN(h), '%Y-%m-%d %H:%M:%S') AS first_hour,
               STRFTIME(MAX(h), '%Y-%m-%d %H:%M:%S') AS last_hour
        FROM c
        GROUP BY 1, 2
    """,
)
def segment_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    seg = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.length("props") + _ROW_OVERHEAD).cast("long").alias("bytes"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = seg.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    )
    return (
        c.withColumn(
            "bin_id", F.expr(f"cum_before DIV {COMPACT_TARGET_BYTES}")
        )
        .groupBy("event_type", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("bytes").cast("long").alias("bin_bytes"),
            F.sum("n_rows").cast("long").alias("bin_rows"),
            F.date_format(F.min("h"), "yyyy-MM-dd HH:mm:ss").alias("first_hour"),
            F.date_format(F.max("h"), "yyyy-MM-dd HH:mm:ss").alias("last_hour"),
        )
    )
