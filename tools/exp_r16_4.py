"""r16 experiment 4: source_overlap_matrix — persist vs exchange-reuse, and
per-row pre-dedup of the exploded token stream.

Run: python tools/exp_r16_4.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import (
    fanout, load, persist_shared_corpus_frame, release_shared_frames,
)
from pulsar_3_2_codedump_spark.queries import load_all
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import wait_healthy

SF = "/root/testdata/sf0.1"


def overlap_from(tok):
    sz = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = tok.select(F.col("source").alias("source_a"), "word")
    b = tok.select(F.col("source").alias("source_b"), "word")
    ix = (
        a.join(b, "word")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        ix.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("inter").cast("long").alias("inter"),
            F.round(
                F.col("inter")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )


def build(spark, mode: str):
    docs = fanout(load(spark, SF, "documents"))
    if mode == "prededup":
        raw = docs.select(
            "source",
            F.explode(
                F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
            ).alias("word"),
        )
    else:
        raw = docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
        )
    tok = raw.distinct()
    if mode == "persist":
        tok = persist_shared_corpus_frame(tok)
    return overlap_from(tok)


def main() -> None:
    import time

    reg = load_all()
    spark = get_spark("exp_r16_4")
    modes = ("persist", "reuse", "prededup")
    results = {m: [] for m in modes}
    for rep in range(4):
        cores = wait_healthy(spark)
        for m in modes:
            release_shared_frames()
            t0 = time.time()
            build(spark, m).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_shared_frames()
            results[m].append(dt)
            print(f"# rep{rep} (cores {cores}) overlap_{m}: {dt:.3f}s", flush=True)
    for m, v in results.items():
        print(f"MIN overlap_{m}: {min(v):.3f}s  (all: {[round(x,3) for x in v]})", flush=True)
    # equality sanity
    cur = reg["source_overlap_matrix"].fn(spark, SF)
    alt = build(spark, "prededup")
    d = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    print("prededup diff rows:", d, flush=True)


if __name__ == "__main__":
    main()
