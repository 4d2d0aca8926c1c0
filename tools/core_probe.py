"""Standalone effective-cores probe (BASELINE.md r11 host-oversubscription
finding): measures the machine's deliverable JVM parallelism RIGHT NOW with
the same 1-vs-32-task busy-sum ratio bench.py records as
effective_cores_start, without paying for a bench run. Use it to decide
whether a bench series taken now would measure the engine or the host
(healthy grant: ≳ 24 of 32).

Prints one JSON line: {"effective_cores": N, "load_1m": L}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_3_2_codedump_spark.session import get_spark


def main() -> None:
    spark = get_spark("core_probe")
    from pyspark.sql import functions as F

    def probe(nparts: int, n_rows: int) -> float:
        df = spark.range(0, n_rows, numPartitions=nparts).select(
            F.sum(F.pmod(F.col("id") * 1315423911, F.lit(1000)))
        )
        t0 = time.time()
        df.collect()
        return n_rows / (time.time() - t0)

    probe(32, 50_000_000)  # warm codegen for this shape
    thr1 = probe(1, 100_000_000)
    thr32 = probe(32, 3_200_000_000)
    print(
        json.dumps(
            {
                "effective_cores": round(thr32 / thr1, 1),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
