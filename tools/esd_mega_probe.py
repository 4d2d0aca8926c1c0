"""One-off SCALE measurement: the ESD mega-bucket profile (1M identical
docs -> ~37M colliding suffixes in ONE 20-char-prefix bucket; SCALE.md r11
recorded 541.7 s for the gate-less form, the single-task sort ceiling).

Usage: python tools/esd_mega_probe.py [n_docs] [gate|nogate]
Prints one JSON line with the wall time and the checksum aggregates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_3_2_codedump_spark.functions.dedup_ml import exact_substring_stats
from pulsar_3_2_codedump_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "gate"
    spark = get_spark("esd_mega")
    from pyspark.sql import functions as F

    docs = spark.range(0, n_docs, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.lit(" ".join(["aaaa"] * 40)).alias("text"),
    )
    kw = {} if mode == "gate" else {"escalate_threshold": None}
    t0 = time.time()  # construction inside the window: the census probe
    #                   and exact candidate census are real gate work
    agg = exact_substring_stats(docs, **kw).agg(
        F.sum("n_starts").alias("starts"),
        F.sum("dup_starts").alias("dups"),
        F.max("max_dup_len").alias("max_len"),
        F.sum(F.col("saturated").cast("long")).alias("n_saturated"),
    )
    r = agg.collect()[0]
    dt = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "mode": mode,
                "n_docs": n_docs,
                "sec": dt,
                "starts": r["starts"],
                "dups": r["dups"],
                "max_len": r["max_len"],
                "n_saturated": r["n_saturated"],
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
