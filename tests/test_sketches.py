"""Error-bound assertions for the approximate sketches.

Since r8 the sketch queries themselves emit their error envelope (exact
columns + in-bound booleans) so the driver can hash them against a DuckDB
oracle. These tests pin the envelope from the OUTSIDE: the exact columns
must match an independent computation, every in-bound boolean must be
true, and the raw sketch estimates (computed directly here) must sit in
tighter envelopes than the query's generous ones.
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
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.approx_count_distinct("l_partkey").alias("a_parts"),
    ).collect()[0]
    # exact legs hash-anchor the query; they must match recomputation
    assert got["exact_orders"] == exact["orders"]
    assert got["exact_parts"] == exact["parts"]
    assert got["orders_in_bound"] is True and got["parts_in_bound"] is True
    # raw HLL++ estimates stay inside the default-rsd*3 envelope
    for approx, true in [(exact["a_orders"], exact["orders"]),
                         (exact["a_parts"], exact["parts"])]:
        rel = abs(approx - true) / true
        assert rel < 0.15, f"HLL estimate {approx} vs exact {true}: rel err {rel:.3f}"


def test_approx_percentile_within_rank_bound(spark):
    rows = {
        r["l_returnflag"]: r
        for r in load_all()["approx_percentile_sketch"].fn(spark, SF_DIR).collect()
    }
    li = load(spark, SF_DIR, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("p95"),
        )
        .collect()
    }
    for flag, r in rows.items():
        assert r["p50_in_bound"] is True and r["p95_in_bound"] is True
        vals = sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        assert r["n"] == n
        assert r["min_price"] == round(vals[0], 2)
        assert r["max_price"] == round(vals[-1], 2)
        # raw estimates: rank envelope far tighter than the query's ±0.01
        for q, col in [(0.5, "p50"), (0.95, "p95")]:
            rank = int(q * (n - 1))
            slack = max(2, n // 1000 + 1)  # accuracy=10000 → rank err ≤ n/10000
            lo = vals[max(0, rank - slack)]
            hi = vals[min(n - 1, rank + slack)]
            assert lo <= approx[flag][col] <= hi, (
                f"{flag} {col}={approx[flag][col]} outside rank envelope "
                f"[{lo}, {hi}] (n={n})"
            )


def test_count_min_sketch_never_undercounts_and_bounded_overcount(spark):
    from pulsar_3_2_codedump_spark.operators.advanced import (
        CMS_WIDTH,
        count_min_heavy_hitters,
    )

    out = count_min_heavy_hitters(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "events").count()
    assert out
    for r in out:
        assert r["cms_estimate"] >= r["exact_count"]  # CMS never undercounts
        # expected over-count per row is N/width; min over rows stays well
        # under a few multiples of it (deterministic here — fixed hash family)
        assert r["cms_estimate"] <= r["exact_count"] + 5 * n / CMS_WIDTH


def test_theta_kll_battery_estimates_within_error_envelopes(spark):
    from pulsar_3_2_codedump_spark.operators.advanced import theta_kll_sketch_battery

    out = {r["event_type"]: r for r in theta_kll_sketch_battery(spark, SF_DIR).collect()}
    ev = load(spark, SF_DIR, "events")
    raw = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("th_est"),
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_agg_double("value"), F.lit(0.5)
            ).alias("kll50"),
        )
        .collect()
    }
    for t, e in raw.items():
        r = out[t]
        assert r["exact_users"] == e["d"]
        assert r["users_in_bound"] is True
        assert r["q50_in_bound"] is True and r["q95_in_bound"] is True
        # raw theta estimate within a 10% envelope of exact
        assert abs(e["th_est"] - e["d"]) <= max(3, 0.1 * e["d"])
        # raw KLL q50 inside the exact 45-55% rank band
        lo50, hi50 = [
            ev.filter(F.col("event_type") == t)
            .agg(F.percentile("value", F.lit(q)))
            .collect()[0][0]
            for q in (0.45, 0.55)
        ]
        assert lo50 <= e["kll50"] <= hi50
    total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    allr = out["__all__"]
    assert allr["exact_users"] == total
    assert allr["users_in_bound"] is True
    assert allr["q50_in_bound"] is None and allr["q95_in_bound"] is None
