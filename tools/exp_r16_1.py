"""r16 experiment 1: A/B the candidate plan changes for the headline heavies.

Run: python tools/exp_r16_1.py  (background; prints MIN lines per variant)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.catalog import fanout, load
from pulsar_3_2_codedump_spark.envelope import cached_envelope
from pulsar_3_2_codedump_spark.queries import load_all
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = "/root/testdata/sf0.1"


def main() -> None:
    reg = load_all()
    spark = get_spark("exp_r16_1")

    # ---- stats_summary ----------------------------------------------------
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))

    def stats_from(src):
        return src.groupBy("l_returnflag").agg(
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

    print("=== stats_summary ===", flush=True)
    ab_run(
        spark,
        {
            "stats_current": reg["stats_summary"].fn(spark, SF),
            "stats_fanout8": stats_from(li.repartition(8)),
            "stats_fanout16": stats_from(li.repartition(16)),
            "stats_nofanout": stats_from(li),
        },
        reps=4,
    )

    # ---- session_window_gaps ----------------------------------------------
    ev = load(spark, SF, "events")

    def sess_from(src):
        return (
            src.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(
                F.min("ts").alias("mts"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                "user_id",
                F.date_format("mts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
                "n_events",
                "total_value",
            )
        )

    print("=== session_window_gaps ===", flush=True)
    ab_run(
        spark,
        {
            "sess_current": reg["session_window_gaps"].fn(spark, SF),
            "sess_fanout": sess_from(ev.select("ts", "user_id", "value").repartition(32)),
            "sess_repart_user": sess_from(ev.select("ts", "user_id", "value").repartition(32, "user_id")),
        },
        reps=4,
    )

    # ---- tableview_latest: packed-long rank vs struct max_by ---------------
    env = cached_envelope(spark, SF)
    env.count()
    ev2 = load(spark, SF, "events").select(
        F.col("event_id").alias("sequence_id"), "event_type", F.col("value").alias("ev_value")
    )

    rank_long = (F.col("partition").cast("long") * F.lit(1 << 48)) + F.col("offset")
    agg_packed = env.groupBy("key").agg(
        F.max_by("sequence_id", rank_long).alias("sequence_id"),
        F.max_by("offset", rank_long).alias("offset"),
    )
    tv_packed = agg_packed.join(ev2, "sequence_id").select(
        "key", "event_type", F.round("ev_value", 2).alias("value"), "sequence_id", "offset"
    )

    # max(struct) variant: pack rank + payloads into one struct, lexicographic max
    agg_struct = (
        env.groupBy("key")
        .agg(F.max(F.struct("partition", "offset", "sequence_id")).alias("s"))
        .select("key", F.col("s.sequence_id").alias("sequence_id"), F.col("s.offset").alias("offset"))
    )
    tv_structmax = agg_struct.join(ev2, "sequence_id").select(
        "key", "event_type", F.round("ev_value", 2).alias("value"), "sequence_id", "offset"
    )

    print("=== tableview_latest ===", flush=True)
    ab_run(
        spark,
        {
            "tv_current": reg["tableview_latest"].fn(spark, SF),
            "tv_packed_rank": tv_packed,
            "tv_structmax": tv_structmax,
        },
        reps=4,
    )

    # ---- cosine_topk: precomputed norms -------------------------------------
    from pulsar_3_2_codedump_spark.functions.similarity import (
        TOP_K, _query_pred, dot, l2_norm,
    )

    emb = load(spark, SF, "embeddings")
    q = emb.filter(_query_pred()).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    c = fanout(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    cos_norms = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "neighbor_label",
            F.round("cos", 4).alias("cosine_sim"), "rank",
        )
    )

    print("=== cosine_topk ===", flush=True)
    ab_run(
        spark,
        {
            "cos_current": reg["cosine_topk"].fn(spark, SF),
            "cos_norms": cos_norms,
        },
        reps=4,
    )


if __name__ == "__main__":
    main()
