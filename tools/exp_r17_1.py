"""r17 experiment 1: stats_summary — where the time goes, and the
counts-based distributed exact percentile (VERDICT r16 next-round item 1).

The exact-percentile/median aggregates buffer a value->count OpenHashMap of
BOXED doubles per group in an ObjectHashAggregate; on the single-row-group
fixture the partial agg runs in ONE scan task, so 600k rows x 2 maps of
boxed updates serialize on one core, and the final merge+sort parallelizes
over only 3 groups. The counts-based form replaces the map-building with a
codegen primitive hash agg (groupBy flag,which,value -> count), a cumulative
-count window per group, and a closed-form interpolation that replicates
Spark's Percentile.getPercentile bit for bit:

    position  = percentage * (N - 1)
    lower     = floor(position); higher = ceil(position)
    lowerKey  = first value with cum >= lower + 1   (min value where ...)
    higherKey = first value with cum >= higher + 1
    result    = lowerKey                      if higher == lower
              = lowerKey                      if higherKey == lowerKey
              = (higher - position) * lowerKey + (position - lower) * higherKey

Usage: python tools/exp_r17_1.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def current(li: DataFrame) -> DataFrame:
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    return li.groupBy("l_returnflag").agg(
        pcts.alias("__pcts"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias("qty_price_corr"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias("disc_tax_cov"),
    ).select(
        "l_returnflag",
        F.round(F.col("__pcts")[0], 4).alias("p50_price"),
        F.round(F.col("__pcts")[1], 4).alias("p95_price"),
        "med_qty", "sd_price", "qty_price_corr", "disc_tax_cov",
    )


def moments_only(li: DataFrame) -> DataFrame:
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias("qty_price_corr"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias("disc_tax_cov"),
    )


def pcts_only(li: DataFrame) -> DataFrame:
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    return li.groupBy("l_returnflag").agg(
        pcts.alias("__pcts"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


def _interp(pos, lo, hi, k_lo, k_hi):
    """Spark Percentile.getPercentile's exact expression tree."""
    return (
        F.when(hi == lo, k_lo)
        .when(k_hi == k_lo, k_lo)
        .otherwise(
            (hi.cast("double") - pos) * k_lo + (pos - lo.cast("double")) * k_hi
        )
    )


def counts_pcts(li: DataFrame) -> DataFrame:
    """(l_returnflag, p50_price_raw, p95_price_raw, med_qty_raw) via the
    counts-based distributed selection — unrounded doubles."""
    base = li.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("wch"), F.col("l_extendedprice").alias("v")),
                F.struct(F.lit(1).alias("wch"), F.col("l_quantity").alias("v")),
            )
        ).alias("x"),
    ).select("l_returnflag", "x.wch", "x.v").filter(F.col("v").isNotNull())
    counts = base.groupBy("l_returnflag", "wch", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    part = W.partitionBy("l_returnflag", "wch")
    cum = counts.select(
        "l_returnflag",
        "wch",
        "v",
        F.sum("c").over(part.orderBy("v")).alias("cum"),
        F.sum("c").over(part).alias("n"),
    )

    def keys_for(p: float, tag: str):
        pos = F.lit(p) * (F.col("n") - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        return [
            F.min(F.when(F.col("cum") >= lo + 1, F.col("v"))).alias(f"klo_{tag}"),
            F.min(F.when(F.col("cum") >= hi + 1, F.col("v"))).alias(f"khi_{tag}"),
            F.max(pos).alias(f"pos_{tag}"),
            F.max(lo).alias(f"lo_{tag}"),
            F.max(hi).alias(f"hi_{tag}"),
        ]

    sel = cum.groupBy("l_returnflag", "wch").agg(
        *(keys_for(0.5, "50") + keys_for(0.95, "95"))
    )

    def val(tag: str):
        return _interp(
            F.col(f"pos_{tag}"), F.col(f"lo_{tag}"), F.col(f"hi_{tag}"),
            F.col(f"klo_{tag}"), F.col(f"khi_{tag}"),
        )

    return sel.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("wch") == 0, val("50"))).alias("p50_raw"),
        F.max(F.when(F.col("wch") == 0, val("95"))).alias("p95_raw"),
        F.max(F.when(F.col("wch") == 1, val("50"))).alias("med_raw"),
    )


def variant(li: DataFrame) -> DataFrame:
    pcts = counts_pcts(li)
    m = moments_only(li)
    return m.join(F.broadcast(pcts), "l_returnflag").select(
        "l_returnflag",
        F.round("p50_raw", 4).alias("p50_price"),
        F.round("p95_raw", 4).alias("p95_price"),
        F.round("med_raw", 4).alias("med_qty"),
        "sd_price", "qty_price_corr", "disc_tax_cov",
    )


def counts_pcts_repart(li: DataFrame) -> DataFrame:
    """counts_pcts with the narrow projection hash-repartitioned first so
    the explode + primitive hash agg leave the one-task fixture scan
    (session_window_gaps' r16 trick; hash repartition pays no
    sort-before-repartition, unlike round-robin)."""
    n = li.sparkSession.sparkContext.defaultParallelism
    narrow = li.select("l_returnflag", "l_extendedprice", "l_quantity").repartition(
        n, "l_returnflag", "l_extendedprice"
    )
    base = narrow.select(
        "l_returnflag",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("wch"), F.col("l_extendedprice").alias("v")),
                F.struct(F.lit(1).alias("wch"), F.col("l_quantity").alias("v")),
            )
        ).alias("x"),
    ).select("l_returnflag", "x.wch", "x.v").filter(F.col("v").isNotNull())
    counts = base.groupBy("l_returnflag", "wch", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    part = W.partitionBy("l_returnflag", "wch")
    cum = counts.select(
        "l_returnflag", "wch", "v",
        F.sum("c").over(part.orderBy("v")).alias("cum"),
        F.sum("c").over(part).alias("n"),
    )

    def keys_for(p: float, tag: str):
        pos = F.lit(p) * (F.col("n") - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        return [
            F.min(F.when(F.col("cum") >= lo + 1, F.col("v"))).alias(f"klo_{tag}"),
            F.min(F.when(F.col("cum") >= hi + 1, F.col("v"))).alias(f"khi_{tag}"),
            F.max(pos).alias(f"pos_{tag}"),
            F.max(lo).alias(f"lo_{tag}"),
            F.max(hi).alias(f"hi_{tag}"),
        ]

    sel = cum.groupBy("l_returnflag", "wch").agg(
        *(keys_for(0.5, "50") + keys_for(0.95, "95"))
    )

    def val(tag: str):
        return _interp(
            F.col(f"pos_{tag}"), F.col(f"lo_{tag}"), F.col(f"hi_{tag}"),
            F.col(f"klo_{tag}"), F.col(f"khi_{tag}"),
        )

    return sel.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("wch") == 0, val("50"))).alias("p50_raw"),
        F.max(F.when(F.col("wch") == 0, val("95"))).alias("p95_raw"),
        F.max(F.when(F.col("wch") == 1, val("50"))).alias("med_raw"),
    )


def variant_repart(li: DataFrame) -> DataFrame:
    pcts = counts_pcts_repart(li)
    m = moments_only(li)
    return m.join(F.broadcast(pcts), "l_returnflag").select(
        "l_returnflag",
        F.round("p50_raw", 4).alias("p50_price"),
        F.round("p95_raw", 4).alias("p95_price"),
        F.round("med_raw", 4).alias("med_qty"),
        "sd_price", "qty_price_corr", "disc_tax_cov",
    )


def variant_split_spark_pct(li: DataFrame) -> DataFrame:
    """Keep Spark's exact percentile/median aggregates (selection — result
    independent of partitioning) but run their partial phase in parallel
    off a hash-repartitioned 3-col projection; moments stay on the
    un-repartitioned scan so their merge structure is unchanged."""
    n = li.sparkSession.sparkContext.defaultParallelism
    narrow = li.select("l_returnflag", "l_extendedprice", "l_quantity").repartition(
        n, "l_returnflag", "l_extendedprice"
    )
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    p = narrow.groupBy("l_returnflag").agg(
        pcts.alias("__pcts"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )
    m = moments_only(li)
    return m.join(F.broadcast(p), "l_returnflag").select(
        "l_returnflag",
        F.round(F.col("__pcts")[0], 4).alias("p50_price"),
        F.round(F.col("__pcts")[1], 4).alias("p95_price"),
        "med_qty", "sd_price", "qty_price_corr", "disc_tax_cov",
    )


def main() -> None:
    spark = get_spark("exp_r17_1")
    li = load(spark, SF, "lineitem")

    # ---- bit-exactness proof: unrounded doubles, both SFs -----------------
    for sf in ("/root/testdata/sf0.01", SF):
        lx = load(spark, sf, "lineitem")
        old = {
            r["l_returnflag"]: (r["p50"], r["p95"], r["med"])
            for r in lx.groupBy("l_returnflag")
            .agg(
                F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
                F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
                F.median("l_quantity").alias("med"),
            )
            .collect()
        }
        new = {
            r["l_returnflag"]: (r["p50_raw"], r["p95_raw"], r["med_raw"])
            for r in counts_pcts(lx).collect()
        }
        import struct as st

        def bits(t):
            return tuple(st.pack("<d", x).hex() for x in t)

        ok = all(bits(old[k]) == bits(new[k]) for k in old) and set(old) == set(new)
        print(f"BITEXACT {sf}: {ok}")
        if not ok:
            for k in sorted(old):
                print(" ", k, old[k], new.get(k))
            sys.exit(1)

    # repartitioned counts form must be bit-exact too
    lx = load(spark, SF, "lineitem")
    import struct as st

    old = {
        r["l_returnflag"]: tuple(
            st.pack("<d", x).hex() for x in (r["p50"], r["p95"], r["med"])
        )
        for r in lx.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
            F.median("l_quantity").alias("med"),
        )
        .collect()
    }
    new = {
        r["l_returnflag"]: tuple(
            st.pack("<d", x).hex()
            for x in (r["p50_raw"], r["p95_raw"], r["med_raw"])
        )
        for r in counts_pcts_repart(lx).collect()
    }
    print(f"BITEXACT repart {SF}: {old == new}")

    # ---- timing ------------------------------------------------------------
    ab_run(
        spark,
        {
            "current": current(li),
            "moments_only": moments_only(li),
            "counts_variant": variant(li),
            "counts_repart": variant_repart(li),
            "split_spark_pct": variant_split_spark_pct(li),
        },
        reps=4,
    )


if __name__ == "__main__":
    main()
