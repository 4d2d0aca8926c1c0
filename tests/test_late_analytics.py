"""Late round-8 analytics: TWAP, MAD outliers, PMI collocations, source overlap."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from tests.conftest import SF_DIR


def test_twap_span_telescopes_and_stays_in_range(spark):
    from pulsar_3_2_codedump_spark.operators.behavior import time_weighted_avg

    out = {r["event_type"]: r for r in time_weighted_avg(spark, SF_DIR).collect()}
    ev = (
        load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.expr("max(unix_micros(ts) div 1000) - min(unix_micros(ts) div 1000)").alias("span"),
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    for r in ev.collect():
        o = out[r["event_type"]]
        # consecutive-gap sum telescopes to last - first
        assert o["span_ms"] == r["span"]
        assert o["n_intervals"] == r["n"] - 1
        # a weighted mean can never leave the value hull
        assert r["lo"] - 1e-6 <= o["twap"] <= r["hi"] + 1e-6
        assert r["lo"] - 1e-6 <= o["unweighted_avg"] <= r["hi"] + 1e-6


def test_mad_outliers_are_a_robust_minority(spark):
    from pulsar_3_2_codedump_spark.functions.drift import robust_mad_outliers

    rows = robust_mad_outliers(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert r["mad"] <= r["max_adev"]
        # 50% breakdown point: the flagged set must be a strict minority
        assert r["n_outliers"] < r["n"] * 0.5


def test_pmi_collocations_support_and_marginal_bounds(spark):
    from pulsar_3_2_codedump_spark.functions.text import (
        PMI_MIN_COUNT,
        PMI_TOPK,
        pmi_collocations,
    )

    rows = pmi_collocations(spark, SF_DIR).collect()
    assert 0 < len(rows) <= PMI_TOPK
    for r in rows:
        assert r["cnt_xy"] >= PMI_MIN_COUNT
        # a pair cannot occur more often than either of its marginals
        assert r["c1"] >= r["cnt_xy"] and r["c2"] >= r["cnt_xy"]
        assert r["lift"] > 0
    # ranked output: descending lift
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_source_overlap_matrix_is_upper_triangular_and_bounded(spark):
    from pulsar_3_2_codedump_spark.functions.dedup_ml import source_overlap_matrix

    rows = source_overlap_matrix(spark, SF_DIR).collect()
    assert rows
    n_sources = load(spark, SF_DIR, "documents").select("source").distinct().count()
    assert len(rows) <= n_sources * (n_sources - 1) // 2
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        key = (r["source_a"], r["source_b"])
        assert key not in seen
        seen.add(key)
        assert 0 < r["inter"] <= min(r["vocab_a"], r["vocab_b"])
        assert 0 < r["jaccard"] <= 1.0


def test_truncated_recall_bounds_and_k(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import (
        TRUNC_K,
        truncated_embedding_recall,
    )

    rows = truncated_embedding_recall(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] == TRUNC_K
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert abs(r["recall_at_k"] - r["n_hit"] / TRUNC_K) < 1e-9


def test_compaction_plan_conserves_bytes_and_rows(spark):
    from pulsar_3_2_codedump_spark.operators.layout import (
        _ROW_OVERHEAD,
        segment_compaction_plan,
    )

    plan = segment_compaction_plan(spark, SF_DIR)
    got = {
        r["event_type"]: (r["bytes"], r["rows"])
        for r in plan.groupBy("event_type")
        .agg(F.sum("bin_bytes").alias("bytes"), F.sum("bin_rows").alias("rows"))
        .collect()
    }
    want = {
        r["event_type"]: (r["bytes"], r["rows"])
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.length("props") + _ROW_OVERHEAD).alias("bytes"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    }
    assert got == want  # the plan is a partition of the log: nothing lost
    for r in plan.collect():
        assert r["n_segments"] >= 1
        assert r["first_hour"] <= r["last_hour"]
    # bin ids are contiguous from 0 per type
    for et in got:
        bins = sorted(
            r["bin_id"] for r in plan.filter(F.col("event_type") == et).collect()
        )
        assert bins == list(range(len(bins)))


def test_hll_weekly_union_tracks_exact(spark):
    from pulsar_3_2_codedump_spark.operators.advanced import hll_union_windows

    rows = hll_union_windows(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["merged_days"] <= 7
        # 256 registers + linear-counting small-range correction: the merged
        # estimate stays within 35% of exact at any fixture scale
        assert abs(r["hll_estimate"] - r["n_exact"]) <= max(5.0, 0.35 * r["n_exact"])


def test_passjoin_equals_brute_force(spark):
    from pulsar_3_2_codedump_spark.functions.dedup_ml import passjoin_edit_pairs

    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in passjoin_edit_pairs(spark, SF_DIR).collect()
    }
    d = (
        load(spark, SF_DIR, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    a = d.select(F.col("name").alias("na"))
    b = d.select(F.col("name").alias("nb"))
    want = {
        (r["na"], r["nb"], r["d"])
        for r in a.crossJoin(b)
        .filter(F.col("na") < F.col("nb"))
        .withColumn("d", F.levenshtein("na", "nb").cast("long"))
        .filter(F.col("d") <= 1)
        .collect()
    }
    assert got == want  # soundness AND completeness vs the quadratic verify


def test_passjoin_segment_property_holds_under_any_single_edit():
    # the filter theorem the join relies on: if lev(s, t) <= 1 then t starts
    # with s's prefix segment or ends with s's suffix segment
    import random

    rng = random.Random(42)
    alpha = "abcdef"
    for _ in range(2000):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 12)))
        kind = rng.choice(["sub", "ins", "del", "none"])
        p = rng.randrange(len(s))
        if kind == "sub":
            t = s[:p] + rng.choice(alpha) + s[p + 1 :]
        elif kind == "ins":
            t = s[:p] + rng.choice(alpha) + s[p:]
        elif kind == "del":
            t = s[:p] + s[p + 1 :]
        else:
            t = s
        l1 = len(s) // 2
        assert t.startswith(s[:l1]) or t.endswith(s[l1:]), (s, t, kind, p)


def test_rrf_fusion_scores_are_consistent(spark):
    from pulsar_3_2_codedump_spark.functions.retrieval import (
        RRF_C,
        RRF_EMIT,
        RRF_POOL,
        hybrid_rrf_fusion,
    )

    rows = hybrid_rrf_fusion(spark, SF_DIR).collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert 0 <= r["rank_lex"] <= RRF_POOL
        assert 0 <= r["rank_dense"] <= RRF_POOL
        assert r["rank_lex"] > 0 or r["rank_dense"] > 0  # in at least one pool
        want = (1 / (RRF_C + r["rank_lex"]) if r["rank_lex"] else 0.0) + (
            1 / (RRF_C + r["rank_dense"]) if r["rank_dense"] else 0.0
        )
        assert abs(r["rrf"] - want) < 1e-6
    for q, rs in per_q.items():
        assert len(rs) <= RRF_EMIT
        scores = sorted((r["rrf"] for r in rs), reverse=True)
        assert scores[0] == max(r["rrf"] for r in rs)


def test_bitmap_rollup_is_exact_and_merge_only_shrinks(spark):
    from pulsar_3_2_codedump_spark.operators.advanced import bitmap_distinct_rollup

    rows = bitmap_distinct_rollup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["exact_match"] is True
        assert r["bitmap_distinct"] == r["n_exact"]
        # summing daily popcounts double-counts users active on several days
        assert r["daily_popcount_sum"] >= r["bitmap_distinct"]


def test_filtered_search_postfilter_never_beats_prefilter(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import (
        TOP_K,
        filtered_vector_search,
    )

    rows = filtered_vector_search(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_exact"] <= TOP_K
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert abs(r["postfilter_recall"] - r["n_hit"] / r["n_exact"]) < 1e-6
        assert r["n_candidates"] >= r["n_exact"]


def test_streaming_hll_matches_batch_registers(spark):
    from pulsar_3_2_codedump_spark.envelope import wrap_events
    from pulsar_3_2_codedump_spark.streaming.queries_streaming import (
        streaming_hll_distinct,
    )

    got = {r["event_type"]: r for r in streaming_hll_distinct(spark, SF_DIR).collect()}
    assert got
    env = wrap_events(load(spark, SF_DIR, "events")).filter(F.col("sequence_id") < 400)
    exact = {
        r["event_type"]: r["n"]
        for r in env.groupBy(
            F.col("properties")["event_type"].alias("event_type")
        )
        .agg(F.countDistinct("key").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, r in got.items():
        assert 1 <= r["n_registers"] <= 256
        # merged-across-generations registers estimate the replayed range
        assert abs(r["hll_estimate"] - exact[et]) <= max(5.0, 0.35 * exact[et])


def test_position_attribution_conserves_basis_points(spark):
    from pulsar_3_2_codedump_spark.operators.behavior import (
        attribution_position_based,
    )

    rows = attribution_position_based(spark, SF_DIR).collect()
    assert rows
    purchases = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    # every conversion credits exactly 10000 bps — nothing lost to rounding
    assert sum(r["bps_total"] for r in rows) == 10000 * purchases
    for r in rows:
        assert r["n_touches"] >= r["n_conversions"] > 0
        assert r["bps_total"] > 0
        assert r["revenue_credited"] >= 0


def test_peak_concurrency_matches_python_sweep(spark):
    from pulsar_3_2_codedump_spark.operators.timeops import peak_concurrency_sweep

    got = {
        r["event_type"]: (r["peak_concurrency"], r["first_peak_us"])
        for r in peak_concurrency_sweep(spark, SF_DIR).collect()
    }
    rows = (
        load(spark, SF_DIR, "events")
        .select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + F.floor("value").cast("long") * 1_000_000).alias("e"),
        )
        .collect()
    )
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["s"], r["e"], r["event_id"]))
    for et, ivs in by_type.items():
        pts = [(s, 1, eid) for s, e, eid in ivs] + [(e, -1, eid) for s, e, eid in ivs]
        pts.sort()
        run = peak = 0
        first = None
        for t, d, _ in pts:
            run += d
            if run > peak:
                peak, first = run, t
        assert got[et] == (peak, first), et


def test_missing_hours_audit_partitions_the_spine(spark):
    from pulsar_3_2_codedump_spark.operators.timeops import missing_hours_audit

    rows = missing_hours_audit(spark, SF_DIR).collect()
    assert rows
    expected = {r["n_expected"] for r in rows}
    assert len(expected) == 1  # one global spine shared by every type
    for r in rows:
        assert r["n_expected"] == r["n_present"] + r["n_missing"]
        assert (r["n_missing"] == 0) == (r["first_missing_hour"] == "none")


def test_ab_test_z_from_counts(spark):
    import math

    from pulsar_3_2_codedump_spark.functions.drift import ab_test_z_scores

    rows = ab_test_z_scores(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert "purchase" != r["event_type"]  # purchase is the outcome, not a surface
        assert 0 < r["x_a"] + r["x_b"] < r["n_a"] + r["n_b"]
        p = (r["x_a"] + r["x_b"]) / (r["n_a"] + r["n_b"])
        se = math.sqrt(p * (1 - p) * (1 / r["n_a"] + 1 / r["n_b"]))
        want = (r["x_a"] / r["n_a"] - r["x_b"] / r["n_b"]) / se
        assert abs(r["z"] - want) < 1e-3


def test_phash_banding_is_complete_vs_brute_force(spark):
    from pulsar_3_2_codedump_spark.functions.multimodal import (
        PH_HAM,
        _PH_SPARK,
        phash_banded_neardup,
    )

    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in phash_banded_neardup(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents")
    ph = (
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.expr("transform(split(text, ''), ch -> ascii(ch))").alias("codes"),
            F.length("text").alias("n"),
        )
        .select(
            "media_id", "codes", "n",
            F.expr("(n + 31) div 32").alias("w"),
            F.expr("aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)").alias("tot"),
        )
        .select("media_id", F.expr(_PH_SPARK).alias("ph"))
    )
    a = ph.select(F.col("media_id").alias("ma"), F.col("ph").alias("pa"))
    b = ph.select(F.col("media_id").alias("mb"), F.col("ph").alias("pb"))
    want = {
        (r["ma"], r["mb"], r["h"])
        for r in a.crossJoin(b)
        .filter(F.col("ma") < F.col("mb"))
        .withColumn("h", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("long"))
        .filter(F.col("h") <= PH_HAM)
        .collect()
    }
    assert got == want  # banding loses nothing at hamming <= PH_HAM


def test_phash_pigeonhole_band_guarantee():
    import random

    rng = random.Random(7)
    for _ in range(3000):
        x = rng.getrandbits(32)
        y = x
        for _ in range(rng.randint(0, 3)):
            y ^= 1 << rng.randrange(32)
        shares = any(((x >> (8 * j)) & 255) == ((y >> (8 * j)) & 255) for j in range(4))
        assert shares  # <= 3 flipped bits cannot touch all 4 bytes


def test_resize_stats_match_python_stride(spark):
    from pulsar_3_2_codedump_spark.functions.multimodal import (
        multimodal_resize_stats,
    )

    got = {
        r["media_id"]: (r["n_bytes"], r["checksum"])
        for r in multimodal_resize_stats(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").filter(F.col("doc_id") < 100).collect()
    assert got
    for r in docs:
        small = r["text"].encode("utf-8")[::4]
        assert got[r["doc_id"]] == (len(small), sum(small))


def test_sequential_pattern_support_matches_python(spark):
    from pulsar_3_2_codedump_spark.operators.behavior import (
        sequential_pattern_support,
    )

    got = {
        (r["type_a"], r["type_b"]): (r["n_support"], r["n_users_a"])
        for r in sequential_pattern_support(spark, SF_DIR).collect()
    }
    rows = load(spark, SF_DIR, "events").select("user_id", "event_type", "ts").collect()
    prof = {}
    for r in rows:
        k = (r["user_id"], r["event_type"])
        lo, hi = prof.get(k, (None, None))
        prof[k] = (
            r["ts"] if lo is None or r["ts"] < lo else lo,
            r["ts"] if hi is None or r["ts"] > hi else hi,
        )
    import collections

    sup = collections.Counter()
    has = collections.Counter()
    for (u, ta), (lo_a, _) in prof.items():
        has[ta] += 1
        for (u2, tb), (_, hi_b) in prof.items():
            if u2 == u and tb != ta and lo_a < hi_b:
                sup[(ta, tb)] += 1
    assert got == {k: (v, has[k[0]]) for k, v in sup.items()}


def test_consistent_hash_rebalance_moves_only_to_joiner(spark):
    from pulsar_3_2_codedump_spark.operators.routing import (
        CHR_AFTER,
        consistent_hash_rebalance,
    )

    rows = consistent_hash_rebalance(spark, SF_DIR).collect()
    assert rows
    joiner = CHR_AFTER[-1]
    total = sum(r["n_keys"] for r in rows)
    moved = sum(r["n_keys"] for r in rows if r["moved"])
    for r in rows:
        assert r["moved"] == (r["consumer_before"] != r["consumer_after"])
        if r["moved"]:
            # consistent hashing's contract: keys move ONLY to the joiner
            assert r["consumer_after"] == joiner
        assert r["consumer_before"] != joiner  # joiner owned nothing before
    assert 0 < moved < total  # the joiner takes a strict, non-empty share


def test_watermark_lag_identifies_straggler_and_leader(spark):
    from pulsar_3_2_codedump_spark.operators.timeops import watermark_partition_lag

    rows = watermark_partition_lag(spark, SF_DIR).collect()
    assert rows
    lags = {r["partition"]: r["lag_ms"] for r in rows}
    assert min(lags.values()) == 0  # the most-advanced partition has zero lag
    holders = [r for r in rows if r["is_watermark_holder"]]
    assert holders
    worst = max(lags.values())
    for h in holders:
        assert lags[h["partition"]] == worst  # the straggler defines the watermark
