"""Error-bound assertions for the two approximate sketches (VERDICT r4
item 10): their estimates are engine-specific (no cross-engine oracle), so
the correctness contract is a RELATIVE ERROR BOUND against the exact answer
computed on the same fixture.

Bounds: approx_count_distinct's default rsd is 5% (HLL++; bound asserted at
3×rsd); approx_percentile with accuracy=10000 guarantees rank error
≤ 1/10000, asserted via the value at rank ± n/1000 as tolerance envelope.
"""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.queries import load_all
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd_bound(spark):
    got = load_all()["approx_distinct_sketch"].fn(spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
    ).collect()[0]
    for approx, true in [(got["approx_orders"], exact["orders"]),
                         (got["approx_parts"], exact["parts"])]:
        rel = abs(approx - true) / true
        assert rel < 0.15, f"HLL estimate {approx} vs exact {true}: rel err {rel:.3f}"


def test_approx_percentile_within_rank_bound(spark):
    rows = {r["l_returnflag"]: r for r in load_all()["approx_percentile_sketch"].fn(spark, SF_DIR).collect()}
    li = load(spark, SF_DIR, "lineitem")
    for flag, r in rows.items():
        vals = sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == flag).select("l_extendedprice").collect()
        )
        n = len(vals)
        for q, col in [(0.5, "p50_approx"), (0.95, "p95_approx")]:
            rank = int(q * (n - 1))
            slack = max(2, n // 1000 + 1)  # accuracy=10000 → rank err ≤ n/10000
            lo = vals[max(0, rank - slack)]
            hi = vals[min(n - 1, rank + slack)]
            assert lo <= r[col] <= hi, (
                f"{flag} {col}={r[col]} outside rank envelope [{lo}, {hi}] (n={n})"
            )


def test_count_min_sketch_never_undercounts_and_bounded_overcount(spark):
    from pyspark.sql import functions as F

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.operators.advanced import (
        CMS_WIDTH,
        count_min_heavy_hitters,
    )
    from tests.conftest import SF_DIR

    out = count_min_heavy_hitters(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "events").count()
    assert out
    for r in out:
        assert r["cms_estimate"] >= r["exact_count"]  # CMS never undercounts
        # expected over-count per row is N/width; min over rows stays well
        # under a few multiples of it (deterministic here — fixed hash family)
        assert r["cms_estimate"] <= r["exact_count"] + 5 * n / CMS_WIDTH


def test_theta_kll_battery_estimates_within_error_envelopes(spark):
    from pyspark.sql import functions as F

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.operators.advanced import theta_kll_sketch_battery
    from tests.conftest import SF_DIR

    out = {r["event_type"]: r for r in theta_kll_sketch_battery(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.percentile("value", F.lit(0.5)).alias("q50"),
            F.percentile("value", F.lit(0.95)).alias("q95"),
        )
        .collect()
    }
    for t, e in exact.items():
        r = out[t]
        assert abs(r["approx_distinct_users"] - e["d"]) <= max(3, 0.1 * e["d"])
        # KLL rank error ~1.65% at default k; value-space tolerance derived
        # from neighboring exact quantiles is loose enough at 5% rank
        lo50, hi50 = [
            ev.filter(F.col("event_type") == t)
            .agg(F.percentile("value", F.lit(q)))
            .collect()[0][0]
            for q in (0.45, 0.55)
        ]
        assert lo50 <= r["q50_value"] <= hi50
    total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(out["__all__"]["approx_distinct_users"] - total) <= max(3, 0.1 * total)
