"""Streaming top-k, RFM segmentation, anomaly z-scores (§2.N-behavior)."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import wrap_events
from pulsar_3_2_codedump_spark.operators.behavior import anomaly_zscore, rfm_scores
from tests.conftest import SF_DIR


def test_streaming_topk_matches_batch_counts(spark):
    from pulsar_3_2_codedump_spark.streaming.queries_streaming import streaming_topk

    got = [(r["event_type"], r["cnt"]) for r in streaming_topk(spark, SF_DIR).collect()]
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 400)
    want = [
        (r["event_type"], r["cnt"])
        for r in env.groupBy(F.col("properties")["event_type"].alias("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(3)
        .collect()
    ]
    assert got == want


def test_rfm_quintiles_are_balanced(spark):
    out = rfm_scores(spark, SF_DIR)
    n = out.count()
    buyers = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n == buyers
    for c in ["r_score", "f_score", "m_score"]:
        sizes = [r["n"] for r in out.groupBy(c).agg(F.count(F.lit(1)).alias("n")).collect()]
        assert len(sizes) == min(5, n)
        assert max(sizes) - min(sizes) <= 1  # NTILE balance property


def test_anomaly_zscores_center_on_zero_per_type(spark):
    out = anomaly_zscore(spark, SF_DIR)
    for r in out.groupBy("event_type").agg(F.round(F.avg("z"), 3).alias("mz")).collect():
        assert abs(r["mz"]) < 0.01  # z-scores of a series vs its own mean sum to ~0


def test_event_graph_pagerank_mass_and_positivity(spark):
    # fixed-point PageRank invariants: every rank positive, total mass ≤
    # SCALE and within the truncation bound (each DIV loses < 1 unit per
    # edge/node per iteration, plus 15% damping leak has no dangling
    # redistribution), and ranks vary across nodes (non-degenerate graph)
    from pulsar_3_2_codedump_spark.operators.behavior import (
        PR_SCALE,
        event_graph_pagerank,
    )
    from tests.conftest import SF_DIR

    rows = event_graph_pagerank(spark, SF_DIR).collect()
    assert len(rows) >= 2
    prs = [r["pr_scaled"] for r in rows]
    assert all(p > 0 for p in prs)
    total = sum(prs)
    n, e = len(rows), len(rows) ** 2
    # truncation loses at most ~(e + n + 2) units per iteration
    assert total <= PR_SCALE
    assert total >= PR_SCALE - 2 * (e + n + 2) - 2  # 2 iterations
    assert len(set(prs)) > 1
    assert all(r["out_weight"] > 0 for r in rows)  # no dangling nodes here
