"""r17 experiment 5: cosine-norm precompute A/B for the rolled-out ANN
family (VERDICT r16 next-round item 3, guide §1.2 per-task work).

cosine(a, b) re-folds BOTH operand norms inside every scored pair, so a
|q| x |corpus| scoring pass pays 3 array folds per pair; projecting each
side's L2 norm once per row and scoring with dot/(q_norm*c_norm) is the
identical IEEE expression (proven by the DuckDB oracle hash on every
touched query) with 1 fold per pair. r16 measured the transform on
cosine_topk at 0.34 s vs 0.73 s; this script A/Bs three representative
topologies of the r17 rollout:

  - hard_negative_mining: broadcast-queries x full corpus (the
    cosine_topk shape, dominated by the scored join)
  - knn_label_vote: same, with label payloads
  - semdedup_prune: corpus x broadcast centroids argmax + per-cluster
    pairwise pass, with the corpus norm persisted through the shared
    assignment frame (one fold serves BOTH passes)

Old forms are the r16 pipelines verbatim (cosine() per pair). Row-level
equality is asserted before timing (exceptAll both ways — exact binary
comparison, doubles included).

Usage: python tools/exp_r17_5.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.catalog import fanout, load
from pulsar_3_2_codedump_spark.functions.similarity import (
    HN_NEG_K,
    HN_POS_K,
    SEMDEDUP_K,
    SEMDEDUP_T,
    _query_pred,
    cosine,
    hard_negative_mining,
    knn_label_vote,
    semdedup_prune,
)
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pulsar_3_2_codedump_spark.functions.similarity import TOP_K


def old_hnm(spark) -> DataFrame:
    emb = load(spark, SF, "embeddings")
    q = emb.filter(_query_pred()).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("anchor_label"),
    )
    c = fanout(emb).select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("c_emb"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("negative_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") > HN_POS_K) & (F.col("rank") <= HN_POS_K + HN_NEG_K))
        .select(
            "query_id",
            "negative_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cosine_sim"),
            (F.col("anchor_label") == F.col("negative_label")).alias("same_label"),
        )
    )


def old_knn(spark) -> DataFrame:
    emb = load(spark, SF, "embeddings")
    q = emb.filter(_query_pred()).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
    )
    c = fanout(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
    votes = topk.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    vw = W.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("neighbor_label"))
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").cast("int").alias("predicted_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
            F.when(F.col("neighbor_label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("correct"),
        )
    )


def old_semdedup(spark) -> DataFrame:
    emb = load(spark, SF, "embeddings")
    cents = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(SEMDEDUP_K)
        .select(F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cent"))
    )
    from pulsar_3_2_codedump_spark.catalog import persist_shared_corpus_frame

    aw = W.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("cluster_id"))
    assigned = persist_shared_corpus_frame(
        fanout(emb)
        .crossJoin(F.broadcast(cents))
        .withColumn("cc", cosine(F.col("embedding"), F.col("cent")))
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "embedding")
    )
    a = assigned.select(
        F.col("cluster_id").alias("cl"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
    )
    b = assigned.select(
        F.col("cluster_id").alias("cl"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
    )
    pruned = (
        a.join(b, "cl")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cosine(F.col("a_emb"), F.col("b_emb")) >= SEMDEDUP_T)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_pruned", F.lit(True))
    )
    return assigned.join(pruned, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.coalesce(F.col("is_pruned"), F.lit(False)).alias("pruned"),
    )


def check_and_time(spark, name: str, old: DataFrame, new: DataFrame) -> None:
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print(f"{name} DIFF ROWS: {diff}", flush=True)
    assert diff == 0, f"{name}: old and new disagree"
    ab_run(spark, {f"{name}_cosine": old, f"{name}_norms": new}, reps=3)


def main() -> None:
    spark = get_spark()
    check_and_time(
        spark, "hnm", old_hnm(spark), hard_negative_mining(spark, SF)
    )
    check_and_time(
        spark, "knn", old_knn(spark), knn_label_vote(spark, SF)
    )
    from pulsar_3_2_codedump_spark.catalog import release_shared_frames

    release_shared_frames()
    old_sd = old_semdedup(spark)
    new_sd = semdedup_prune(spark, SF)
    check_and_time(spark, "semdedup", old_sd, new_sd)


if __name__ == "__main__":
    main()
