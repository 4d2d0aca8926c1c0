"""r17 experiment 4: rfm_scores fused bucket-counts pass (VERDICT r16
next-round item 7, guide §2.4).

The r16 chained-rank form ran one groupBy(__b_d).count() aggregate per
NTILE dimension — three passes over the checkpointed per-user frame. The
r17 form explodes (dim, bucket) pairs and counts all three dimensions in
ONE pass (<= 3*NTILE_BUCKETS result rows, localCheckpointed control-plane),
then feeds each dimension's carry pipeline from a filter of that frame.
Every row emits exactly one pair per dim, so the per-dim counts — and the
carries, windows, and NTILE ranks derived from them — are bit-identical.

This script (a) proves old == new row-for-row at the given sf, (b) A/Bs
the two full query forms with health-gated interleaved minima.

Usage: python tools/exp_r17_4.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from pulsar_3_2_codedump_spark.catalog import ckpt_unless_plan_only, load
from pulsar_3_2_codedump_spark.operators.behavior import NTILE_BUCKETS, rfm_scores
from pulsar_3_2_codedump_spark.operators.prefixops import exclusive_prefix
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def old_form(spark) -> DataFrame:
    """The r16 pipeline, verbatim: three per-dim bucket-count aggregates."""
    events = load(spark, SF, "events")
    mx = events.agg(F.max("ts").alias("max_ts"))
    per = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("f"),
            F.round(F.sum("value"), 4).alias("m"),
        )
        .join(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff("max_ts", "last_ts").cast("long").alias("r_days"),
            "f",
            "m",
        )
    )
    per = ckpt_unless_plan_only(per, cut_plan_only=True)
    keys = {"r": F.col("r_days"), "f": (-F.col("f")).cast("long"), "m": -F.col("m")}
    bounds = per.agg(
        F.count(F.lit(1)).alias("__N"),
        *[
            x
            for d, k in keys.items()
            for x in (F.min(k).alias(f"__lo_{d}"), F.max(k).alias(f"__hi_{d}"))
        ],
    )
    t = per.crossJoin(F.broadcast(bounds))
    for d, k in keys.items():
        t = t.withColumn(
            f"__b_{d}",
            F.least(
                F.floor(
                    (k - F.col(f"__lo_{d}"))
                    * NTILE_BUCKETS
                    / (F.col(f"__hi_{d}") - F.col(f"__lo_{d}") + 1)
                ),
                F.lit(NTILE_BUCKETS - 1),
            ),
        )
    out = t
    for d, k in keys.items():
        counts = t.groupBy(f"__b_{d}").agg(F.count(F.lit(1)).alias("__n"))
        carry = exclusive_prefix(counts, f"__b_{d}", "__n", "sum", f"__carry_{d}")
        win = Window.partitionBy(f"__b_{d}").orderBy(k, F.col("user_id"))
        out = out.join(F.broadcast(carry), f"__b_{d}").withColumn(
            f"__rn_{d}",
            (
                F.coalesce(F.col(f"__carry_{d}"), F.lit(0)) + F.row_number().over(win)
            ).cast("long"),
        )

    def tile(d: str):
        r0 = F.col(f"__rn_{d}") - 1
        base = F.floor(F.col("__N") / 5)
        rem = F.col("__N") % 5
        big = rem * (base + 1)
        return (
            F.when(r0 < big, F.floor(r0 / (base + 1)) + 1)
            .otherwise(rem + F.floor((r0 - big) / F.greatest(base, F.lit(1))) + 1)
            .cast("int")
        )

    return out.select(
        "user_id", "r_days", "f", "m",
        tile("r").alias("r_score"), tile("f").alias("f_score"), tile("m").alias("m_score"),
    )


def main() -> None:
    spark = get_spark()
    old = old_form(spark)
    new = rfm_scores(spark, SF)

    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print(f"DIFF ROWS: {diff}", flush=True)
    assert diff == 0, "old and new rfm pipelines disagree"

    # bench-faithful: construction (including the eager checkpoints — the
    # fused counts pass runs at construction) + collect inside the timed
    # region, exactly as bench.py times the query
    from tools.ab_bench import ab_run_fns

    ab_run_fns(
        spark,
        {
            "rfm_three_counts": lambda: old_form(spark),
            "rfm_fused_counts": lambda: rfm_scores(spark, SF),
        },
        reps=4,
    )


if __name__ == "__main__":
    main()
