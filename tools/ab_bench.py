"""A/B measurement harness for optimization work on a contended host.

The sandbox hypervisor intermittently grants ~1-2 of 32 cores (bench.py's
documented contention mode), so raw wall-clock A/Bs are garbage during a
wave. This harness gates every repetition on a quick effective-cores probe
and interleaves the variants, reporting per-variant minima over the healthy
repetitions only.

Usage (from an experiment script):

    from tools.ab_bench import ab_run
    ab_run(spark, {"current": df1, "variant": df2}, reps=5)
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

PROBE_OK = 12.0  # accept reps only when the host delivers >= this many cores
PROBE_WAIT = 30  # seconds between probe retries during a wave
PROBE_MAX_WAIT = 1200  # give up waiting after this many seconds


def effective_cores(spark: SparkSession) -> float:
    """1-task vs 32-task JVM busy-sum throughput ratio (bench.py's probe,
    scaled down to ~1s on a healthy host)."""

    def probe(nparts: int, n_rows: int) -> float:
        df = spark.range(0, n_rows, numPartitions=nparts).select(
            F.sum(F.pmod(F.col("id") * 1315423911, F.lit(1000)))
        )
        t0 = time.time()
        df.collect()
        return n_rows / (time.time() - t0)

    probe(32, 20_000_000)  # warm codegen for this shape
    thr1 = probe(1, 50_000_000)
    thr32 = probe(32, 1_600_000_000)
    return round(thr32 / thr1, 1)


def wait_healthy(spark: SparkSession) -> float:
    waited = 0.0
    while True:
        c = effective_cores(spark)
        if c >= PROBE_OK or waited >= PROBE_MAX_WAIT:
            return c
        print(f"# host degraded (probe {c} cores) — waiting {PROBE_WAIT}s", flush=True)
        time.sleep(PROBE_WAIT)
        waited += PROBE_WAIT


def ab_run(
    spark: SparkSession,
    variants: dict[str, DataFrame],
    reps: int = 5,
    warmup: bool = True,
) -> dict[str, float]:
    """Interleave noop-sink executions of each variant; minima over healthy
    reps. Returns {name: min_seconds}."""
    results: dict[str, list[float]] = {k: [] for k in variants}
    if warmup:
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            df.write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        cores = wait_healthy(spark)
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            results[name].append(dt)
            print(f"# rep{rep} (cores {cores}) {name}: {dt:.3f}s", flush=True)
    out = {k: min(v) for k, v in results.items()}
    for k, v in out.items():
        print(f"MIN {k}: {v:.3f}s  (all: {[round(x, 3) for x in results[k]]})", flush=True)
    return out


def ab_run_fns(
    spark: SparkSession,
    variants: dict[str, "callable"],
    reps: int = 5,
    warmup: bool = True,
) -> dict[str, float]:
    """bench.py-faithful A/B: each repetition times CONSTRUCTION + collect
    of a freshly built DataFrame (so eager checkpoints / control-plane
    collects inside the query constructor are inside the timed region,
    exactly as bench.py and the driver time them), with
    release_shared_frames() before every build so no persist survives into
    a later rep. Interleaved variants, health-gated reps, per-variant
    minima — same conventions as ab_run."""
    from pulsar_3_2_codedump_spark.catalog import release_shared_frames

    results: dict[str, list[float]] = {k: [] for k in variants}
    if warmup:
        for name, fn in variants.items():
            release_shared_frames()
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            fn().collect()
    for rep in range(reps):
        cores = wait_healthy(spark)
        for name, fn in variants.items():
            release_shared_frames()
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            fn().collect()
            dt = time.time() - t0
            results[name].append(dt)
            print(f"# rep{rep} (cores {cores}) {name}: {dt:.3f}s", flush=True)
    out = {k: min(v) for k, v in results.items()}
    for k, v in out.items():
        print(f"MIN {k}: {v:.3f}s  (all: {[round(x, 3) for x in results[k]]})", flush=True)
    return out
