"""r17 experiment 3: exact_substring_dedup shuffle width (VERDICT r16
next-round item 5, guide §2.1 shrink-before-shuffle).

The r16 window shuffled the full <= ESD_CAP-char suffix s PLUS its own
ESD_MIN-char bucket prefix; the r17 form shuffles (bucket, tail) only —
tail = s[ESD_MIN:] — because within a bucket partition ORDER BY tail ==
ORDER BY s (equal fixed-length prefix), the LCP kernel only ever folds the
tails, and length(s) == ESD_MIN + length(tail).

This script (a) proves the two pipelines produce identical rows on the
full corpus at the given sf, (b) A/Bs them with health-gated interleaved
minima. Both variants run with the escalation probe disabled so the A/B
isolates the window-shuffle difference (the probe path is byte-identical
between them — it only ever reads the bucket column).

Usage: python tools/exp_r17_3.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from pulsar_3_2_codedump_spark.catalog import fanout, load
from pulsar_3_2_codedump_spark.functions.dedup_ml import (
    ESD_BUCKET_CAP,
    ESD_CAP,
    ESD_MIN,
    ESD_WORDS,
    _lcp_in_bucket,
    exact_substring_stats,
)
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def old_form(docs: DataFrame, bucket_cap: int = ESD_BUCKET_CAP) -> DataFrame:
    """The r16 pipeline, verbatim: full s carried through the window."""
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    t = docs.select("doc_id", ws.alias("ws"))
    pos = t.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("ws"))).alias("pos"), "ws"
    )
    sfx = pos.select(
        "doc_id",
        "pos",
        F.substring(
            F.concat_ws(" ", F.slice(F.col("ws"), F.col("pos"), ESD_WORDS)),
            1,
            ESD_CAP,
        ).alias("s"),
    )
    eligible = sfx.filter(F.length("s") >= ESD_MIN).withColumn(
        "bucket", F.substring("s", 1, ESD_MIN)
    )
    w = Window.partitionBy("bucket").orderBy("s", "doc_id", "pos")
    wcnt = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored = eligible.select(
        "doc_id",
        F.when(F.count(F.lit(1)).over(wcnt) > bucket_cap, F.length("s"))
        .otherwise(
            F.greatest(
                _lcp_in_bucket(F.col("s"), F.lag("s").over(w)),
                _lcp_in_bucket(F.col("s"), F.lead("s").over(w)),
            )
        )
        .alias("dup_len"),
        (F.count(F.lit(1)).over(wcnt) > bucket_cap).alias("sat"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.when(F.col("dup_len") >= ESD_MIN, 1).otherwise(0))
        .cast("long")
        .alias("dup_starts"),
        F.max("dup_len").cast("long").alias("max_dup_len"),
        F.max("sat").alias("saturated"),
    )
    base = t.select("doc_id", F.size("ws").cast("long").alias("n_starts"))
    return base.join(agg.hint("MERGE"), "doc_id", "left").select(
        "doc_id",
        "n_starts",
        F.coalesce(F.col("dup_starts"), F.lit(0)).cast("long").alias("dup_starts"),
        F.coalesce(F.col("max_dup_len"), F.lit(0)).cast("long").alias("max_dup_len"),
        F.coalesce(F.col("saturated"), F.lit(False)).alias("saturated"),
    )


def main() -> None:
    spark = get_spark()
    docs = fanout(load(spark, SF, "documents"))
    old = old_form(docs)
    new = exact_substring_stats(docs, escalate_threshold=None)

    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print(f"DIFF ROWS: {diff}", flush=True)
    assert diff == 0, "old and new ESD pipelines disagree"

    ab_run(spark, {"esd_old_full_s": old, "esd_new_bucket_tail": new}, reps=4)


if __name__ == "__main__":
    main()
