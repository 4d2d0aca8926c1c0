"""r16 experiment 2: hybrid_rrf restructure, rfm chained-ntile, minhash persist.

Run: python tools/exp_r16_2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.catalog import (
    ckpt_unless_plan_only, fanout, load, release_shared_frames,
)
from pulsar_3_2_codedump_spark.queries import load_all
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = "/root/testdata/sf0.1"
RRF_C, RRF_POOL, RRF_EMIT, RRF_STRIDE = 60, 20, 5, 50


def rrf_variant(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import dot, l2_norm

    docs = fanout(load(spark, SF, "documents"))
    # per-doc distinct word set computed per-row (array_distinct) — the
    # global (doc_id, word) DISTINCT exchange disappears, and vocabulary
    # size becomes a per-row size() instead of a groupBy
    wsets = docs.select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+")).alias("wset"),
    )
    tok = wsets.select("doc_id", F.explode("wset").alias("word"))
    qt = wsets.filter(F.col("doc_id") % RRF_STRIDE == 0).select(
        F.col("doc_id").alias("query_id"), F.explode("wset").alias("qword")
    )
    ix = (
        F.broadcast(qt)
        .join(tok, (F.col("qword") == F.col("word")) & (F.col("doc_id") != F.col("query_id")))
        .groupBy("query_id", F.col("doc_id").alias("item_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sq = wsets.select(F.col("doc_id").alias("query_id"), F.size("wset").alias("nq")).filter(
        F.col("query_id") % RRF_STRIDE == 0
    )
    sc = wsets.select(F.col("doc_id").alias("item_id"), F.size("wset").alias("nc"))
    jacc = F.col("inter") / (F.col("nq") + F.col("nc") - F.col("inter")).cast("double")
    wl = W.partitionBy("query_id").orderBy(jacc.desc(), F.asc("item_id"))
    lex = (
        ix.join(F.broadcast(sq), "query_id")
        .join(F.broadcast(sc), "item_id")
        .withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= RRF_POOL)
        .select("query_id", "item_id", "rank_lex")
    )
    emb = load(spark, SF, "embeddings")
    qv = emb.filter(F.col("vec_id") % RRF_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    cv = fanout(emb).select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    wd = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("item_id"))
    dense = (
        F.broadcast(qv)
        .join(cv, F.col("item_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")))
        .withColumn("rank_dense", F.row_number().over(wd))
        .filter(F.col("rank_dense") <= RRF_POOL)
        .select("query_id", "item_id", "rank_dense")
    )
    fused = (
        lex.withColumnsRenamed({"query_id": "lq", "item_id": "li"})
        .join(
            dense,
            (F.col("lq") == F.col("query_id")) & (F.col("li") == F.col("item_id")),
            "full_outer",
        )
        .select(
            F.coalesce("lq", "query_id").alias("query_id"),
            F.coalesce("li", "item_id").alias("item_id"),
            F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
            F.coalesce("rank_dense", F.lit(0)).alias("rank_dense"),
            (
                F.coalesce(1.0 / (RRF_C + F.col("rank_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_C + F.col("rank_dense")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("item_id"))
    return (
        fused.withColumn("fr", F.row_number().over(wf))
        .filter(F.col("fr") <= RRF_EMIT)
        .select(
            "query_id", "item_id",
            F.col("rank_lex").cast("long").alias("rank_lex"),
            F.col("rank_dense").cast("long").alias("rank_dense"),
            F.round("rrf", 6).alias("rrf"),
        )
    )


NTILE_BUCKETS = 32


def rfm_variant(spark):
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
    # ONE bounds+count aggregate for all three dimensions (the per-dim
    # range_bucket/min-max/N aggregates collapse into a single broadcast)
    keys = {"r": F.col("r_days"), "f": (-F.col("f")).cast("long"), "m": -F.col("m")}
    bounds = per.agg(
        F.count(F.lit(1)).alias("__N"),
        *[x for d, k in keys.items() for x in (F.min(k).alias(f"__lo_{d}"), F.max(k).alias(f"__hi_{d}"))],
    )
    t = per.crossJoin(F.broadcast(bounds))
    for d, k in keys.items():
        t = t.withColumn(
            f"__b_{d}",
            F.least(
                F.floor((k - F.col(f"__lo_{d}")) * NTILE_BUCKETS / (F.col(f"__hi_{d}") - F.col(f"__lo_{d}") + 1)),
                F.lit(NTILE_BUCKETS - 1),
            ),
        )
    from pulsar_3_2_codedump_spark.operators.prefixops import exclusive_prefix

    out = t
    for d, k in keys.items():
        counts = t.groupBy(f"__b_{d}").agg(F.count(F.lit(1)).alias("__n"))
        carry = exclusive_prefix(counts, f"__b_{d}", "__n", "sum", f"__carry_{d}")
        win = W.partitionBy(f"__b_{d}").orderBy(k, F.col("user_id"))
        out = out.join(F.broadcast(carry), f"__b_{d}").withColumn(
            f"__rn_{d}",
            (F.coalesce(F.col(f"__carry_{d}"), F.lit(0)) + F.row_number().over(win)).cast("long"),
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
    reg = load_all()
    spark = get_spark("exp_r16_2")

    print("=== hybrid_rrf_fusion ===", flush=True)
    release_shared_frames()
    ab_run(
        spark,
        {
            "rrf_current": reg["hybrid_rrf_fusion"].fn(spark, SF),
            "rrf_wsets": rrf_variant(spark),
        },
        reps=4,
    )

    print("=== rfm_scores ===", flush=True)
    release_shared_frames()
    ab_run(
        spark,
        {
            "rfm_current": reg["rfm_scores"].fn(spark, SF),
            "rfm_chained": rfm_variant(spark),
        },
        reps=4,
    )

    # row-count sanity for the variants (same output shape)
    print("rrf rows:", reg["hybrid_rrf_fusion"].fn(spark, SF).count(), rrf_variant(spark).count(), flush=True)
    print("rfm rows:", reg["rfm_scores"].fn(spark, SF).count(), rfm_variant(spark).count(), flush=True)


if __name__ == "__main__":
    main()
