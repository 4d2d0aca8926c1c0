"""r16 experiment 3: ESD char-wise LCP fold; minhash persist strategies.

Run: python tools/exp_r16_3.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import pulsar_3_2_codedump_spark.functions.dedup_ml as dm
from pulsar_3_2_codedump_spark.catalog import fanout, load, release_shared_frames
from pulsar_3_2_codedump_spark.queries import load_all
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = "/root/testdata/sf0.1"


def _lcp_charwise(a, b):
    """Char-at-a-time cumulative-AND LCP: same integer as the prefix-refold
    form (prefix equality is monotone), but each fold step compares ONE
    character instead of re-comparing the whole prefix."""
    ta = a.substr(F.lit(dm.ESD_MIN + 1), F.lit(dm.ESD_CAP - dm.ESD_MIN))
    tb = b.substr(F.lit(dm.ESD_MIN + 1), F.lit(dm.ESD_CAP - dm.ESD_MIN))

    def cond(i):
        return (
            (i <= F.length(ta))
            & (i <= F.length(tb))
            & (ta.substr(i, F.lit(1)) == tb.substr(i, F.lit(1)))
        )

    tail = F.aggregate(
        F.sequence(F.lit(1), F.lit(dm.ESD_CAP - dm.ESD_MIN)),
        F.struct(F.lit(True).alias("eq"), F.lit(0).alias("n")),
        lambda acc, i: F.struct(
            (acc["eq"] & cond(i)).alias("eq"),
            (acc["n"] + F.when(acc["eq"] & cond(i), 1).otherwise(0)).alias("n"),
        ),
        lambda acc: acc["n"],
    )
    return F.when(b.isNull(), 0).otherwise(F.lit(dm.ESD_MIN) + tail)


def minhash_variant(spark, mode: str):
    docs = fanout(load(spark, SF, "documents"))
    sh = docs.select("doc_id", dm.shingles(F.col("text")).alias("sh"))
    sig = sh.withColumn("hs", dm.base_hashes(F.col("sh"))).select(
        "doc_id", "sh", *dm.minhash_signature(F.col("hs"))
    )
    if mode == "lazy":
        sig = sig.persist()
    elif mode == "ckpt":
        sig = sig.localCheckpoint()
    elif mode == "count":
        sig = sig.persist()
        sig.count()
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"h{b * dm.BAND_SIZE}").alias("b1"),
                        F.col(f"h{b * dm.BAND_SIZE + 1}").alias("b2"),
                    )
                    for b in range(dm.N_HASHES // dm.BAND_SIZE)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "bd.band", "bd.b1", "bd.b2")
    a, bb = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.b1") == F.col("b.b1"))
            & (F.col("a.b2") == F.col("b.b2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    out = cand.join(x, "doc_a").join(y, "doc_b").select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )
    return out, sig


def main() -> None:
    reg = load_all()
    spark = get_spark("exp_r16_3")

    print("=== exact_substring_dedup LCP kernel ===", flush=True)
    esd_current = reg["exact_substring_dedup"].fn(spark, SF)
    orig = dm._lcp_in_bucket
    dm._lcp_in_bucket = _lcp_charwise
    esd_charwise = reg["exact_substring_dedup"].fn(spark, SF)
    dm._lcp_in_bucket = orig
    ab_run(spark, {"esd_current": esd_current, "esd_charwise": esd_charwise}, reps=4)

    # value equality of the two kernels (full frame compare)
    dm._lcp_in_bucket = _lcp_charwise
    esd_charwise2 = reg["exact_substring_dedup"].fn(spark, SF)
    dm._lcp_in_bucket = orig
    diff = esd_current.exceptAll(esd_charwise2).count() + esd_charwise2.exceptAll(esd_current).count()
    print(f"esd kernel diff rows: {diff}", flush=True)

    print("=== minhash persist strategy ===", flush=True)
    import time

    from tools.ab_bench import wait_healthy

    results = {m: [] for m in ("count", "lazy", "ckpt")}
    for rep in range(4):
        cores = wait_healthy(spark)
        for mode in results:
            release_shared_frames()
            t0 = time.time()
            df, sig = minhash_variant(spark, mode)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            sig.unpersist(blocking=True)
            results[mode].append(dt)
            print(f"# rep{rep} (cores {cores}) minhash_{mode}: {dt:.3f}s", flush=True)
    for m, v in results.items():
        print(f"MIN minhash_{m}: {min(v):.3f}s  (all: {[round(x,3) for x in v]})", flush=True)


if __name__ == "__main__":
    main()
