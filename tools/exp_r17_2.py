"""r17 experiment 2: cdc_chunk_dedup — kill the multi-countDistinct Expand
(VERDICT r16 next-round item 4, guide §2.4).

The one-shot groupBy(source).agg(countDistinct(doc_id), count,
countDistinct(chunk), ...) makes Spark Expand-triplicate every chunk row
through the final exchange. The variant pre-aggregates by (source, chunk)
(map-side partials shrink the shuffle to ~distinct chunks), derives
total/distinct/avg-length exactly from the counts, and takes n_docs from
the documents frame (the kernel emits >= 1 chunk per doc unconditionally).

Usage: python tools/exp_r17_2.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pulsar_3_2_codedump_spark.catalog import fanout, load
from pulsar_3_2_codedump_spark.functions.dedup_ml import cdc_chunks
from pulsar_3_2_codedump_spark.session import get_spark
from tools.ab_bench import ab_run

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def old_form(spark) -> DataFrame:
    docs = fanout(load(spark, SF, "documents")).select(
        "doc_id", "source", F.lower(F.trim(F.col("text"))).alias("tx")
    )
    return cdc_chunks(docs).groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_chunks"),
        F.countDistinct("chunk").alias("distinct_chunks"),
        F.round(F.countDistinct("chunk") / F.count(F.lit(1)), 4).alias("unique_ratio"),
        F.round(F.avg(F.length("chunk")), 2).alias("avg_chunk_len"),
    )


def new_form(spark) -> DataFrame:
    from pulsar_3_2_codedump_spark.functions.dedup_ml import cdc_chunk_dedup

    return cdc_chunk_dedup(spark, SF)


def main() -> None:
    spark = get_spark()
    old = old_form(spark)
    new = new_form(spark)

    # exact equality first (sorted collect; counts are integers, the two
    # doubles must be IEEE-identical divisions)
    rows_old = sorted(map(tuple, old.collect()))
    rows_new = sorted(map(tuple, new.collect()))
    assert rows_old == rows_new, (
        f"MISMATCH\nold={rows_old}\nnew={rows_new}"
    )
    print(f"EQUAL: {len(rows_old)} rows bit-identical", flush=True)

    ab_run(spark, {"cdc_old_expand": old, "cdc_new_preagg": new}, reps=4)


if __name__ == "__main__":
    main()
