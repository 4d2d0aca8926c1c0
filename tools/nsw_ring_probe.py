"""One-off SCALE measurement: the NSW long-link md5-ring build at large n.

SCALE.md r15 argues the ring build scales because it is one per-bucket
window (ROW_NUMBER over (md5, vec_id)) plus an equi-join on
(bucket, wrapped rank) — never a global sort — and that bucket count
grows with a longer md5 prefix to keep window partitions bounded. This
probe measures that claim: it reproduces the exact ring construction
from `nsw_long_link_search_recall` (similarity.py) over synthetic
corpora and times edge materialization at several (n, prefix_len)
points, plus one merged-graph beam hop at the capped query-set size so
the per-hop cost is measured, not inferred.

Usage: python tools/nsw_ring_probe.py [n_vectors ...]
Writes one JSON line per measurement to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pulsar_3_2_codedump_spark.functions.similarity import (
    HNSW_EF,
    HNSW_LL_K,
    cosine,
)


def ring_edges(emb: DataFrame, prefix_len: int) -> DataFrame:
    # Identical construction to nsw_long_link_search_recall, with the
    # bucket prefix length as the scale lever documented in SCALE.md.
    llrank = emb.select(
        "vec_id",
        F.md5(F.concat(F.lit("ll:"), F.col("vec_id").cast("string"))).alias("hx"),
    ).select("vec_id", "hx", F.substring("hx", 1, prefix_len).alias("bkt"))
    wll = W.partitionBy("bkt").orderBy("hx", "vec_id")
    llrank = llrank.withColumn("rn", F.row_number().over(wll)).select(
        "vec_id", "bkt", "rn"
    )
    llsz = llrank.groupBy("bkt").agg(F.count(F.lit(1)).alias("bsz"))
    ring_src = (
        llrank.join(llsz, "bkt")
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(HNSW_LL_K))))
        .select(
            "bkt",
            F.col("vec_id").alias("src"),
            (((F.col("rn") - 1 + F.col("j")) % F.col("bsz")) + 1).alias("drn"),
        )
    )
    return (
        ring_src.join(
            llrank.select("bkt", F.col("vec_id").alias("dst"), F.col("rn").alias("drn")),
            ["bkt", "drn"],
        )
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("nsw-ring-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    dims = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.sin((F.col("id") + 1) * i + i).cast("double"),
    )
    for n in sizes:
        emb = spark.range(0, n, numPartitions=64).select(
            F.col("id").alias("vec_id"), dims.alias("embedding")
        )
        # prefix length per the SCALE.md rule: one hex char per 16x growth
        # beyond ~16 * target bucket size; measure the documented step too.
        for plen in (1, 2):
            t0 = time.time()
            edges = ring_edges(emb.select("vec_id"), plen)
            # count() is honest here: the inner join + self-filter cannot be
            # pruned away (unlike the r10 aggregate-output pruning class).
            cnt = edges.count()
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "probe": "ring_build",
                        "n": n,
                        "prefix_len": plen,
                        "edges": cnt,
                        "sec": round(dt, 2),
                        "medges_per_sec": round(cnt / dt / 1e6, 2),
                    }
                ),
                flush=True,
            )
        # one merged-walk beam hop at the capped query count: frontier =
        # beam union ring-neighbors, rescored to EF — the loop body cost.
        ring = ring_edges(emb.select("vec_id"), 2).localCheckpoint()
        qn = 256
        q = emb.filter(F.col("vec_id") % (n // qn) == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        beam = q.select(
            "query_id", (F.col("query_id") * 7 % n).alias("vec_id")
        ).localCheckpoint()
        t0 = time.time()
        nb = beam.join(ring, beam.vec_id == ring.src).select(
            "query_id", F.col("dst").alias("vec_id")
        )
        frontier = beam.unionByName(nb).distinct()
        scored = (
            frontier.join(
                emb.select("vec_id", F.col("embedding").alias("c_emb")), "vec_id"
            )
            .join(F.broadcast(q), "query_id")
            .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
        )
        wq = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        kept = (
            scored.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= HNSW_EF)
            .count()
        )
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "probe": "beam_hop",
                    "n": n,
                    "queries": qn,
                    "kept": kept,
                    "sec": round(dt, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
