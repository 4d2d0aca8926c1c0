"""BM25 retrieval, prefix-filtered set-similarity join, repeated passages,
funnel, and cohort retention (§2.N-retrieval / §2.N-behavior)."""

import datetime as dt
import math

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.functions.dedup_ml import shingles
from pulsar_3_2_codedump_spark.functions.retrieval import (
    bm25,
    passages,
    prefix_jaccard_join,
)
from pulsar_3_2_codedump_spark.operators.behavior import cohort, funnel
from tests.conftest import SF_DIR


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation of the public BM25 formula."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for d, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        out[d] = s
    return out


def test_bm25_matches_reference_formula(spark):
    corpus = [
        (1, "spark stream join window spark"),
        (2, "table scan filter sort merge"),
        (3, "spark join"),
        (4, "window window window stream table scan row"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25(df, ["spark", "window"], 4).collect()}
    ref = _bm25_ref(corpus, ["spark", "window"])
    assert set(got) == set(ref)
    for d in ref:
        assert abs(got[d] - round(ref[d], 4)) < 1e-9, (d, got[d], ref[d])


def test_bm25_rare_term_outscores_common(spark):
    # 'rare' occurs in one doc, 'common' in all — the rare-term doc must rank
    # first for the combined query (idf dominates at equal tf).
    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows.append((9, "rare filler words here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25(df, ["rare", "common"], 1).collect()[0]
    assert top["doc_id"] == 9


def test_prefix_join_lossless_vs_brute_force(spark):
    # Near-dup cluster (1,2,3) + unrelated docs; the prefix-filtered join
    # must produce EXACTLY the brute-force Jaccard >= t pairs.
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i k"),
        (3, "a b c d e f g h l m"),
        (4, "p q r s t u v w x y"),
        (5, "p q r s z z2 z3 z4 z5 z6"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = df.select("doc_id", shingles(F.col("text")).alias("sh"))
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_join(sh, 0.2).collect()
    }
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in x.join(y, F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .collect()
    }
    assert got == brute
    assert (1, 2) in got  # the near-dup pair must be present


def test_repeated_passages_thresholds(spark):
    shared = "one two three four five"
    rows = [
        (1, f"{shared} alpha beta"),
        (2, f"gamma {shared} delta"),
        (3, f"{shared} epsilon"),
        (4, "pair only passage here zeta one"),
        (5, "pair only passage here zeta two"),
        (6, "nothing in common at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["passage"]: (r["n_docs"], r["first_doc"]) for r in passages(df, 5, 3).collect()}
    assert out[shared] == (3, 1)
    # the 2-doc passage must NOT appear at min_docs=3
    assert all("pair only" not in p for p in out)


def _ts(day, hour=0):
    return dt.datetime(2026, 1, day, hour)


def test_funnel_ordering_is_strict(spark):
    rows = [
        # u1 completes all three in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2 clicks BEFORE first view — click step not completed
        (2, _ts(2), "click"), (2, _ts(3), "view"),
        # u3 views only
        (3, _ts(1), "view"),
        # u4 purchase before click — purchase step not completed
        (4, _ts(1), "view"), (4, _ts(3), "click"), (4, _ts(2), "purchase"),
        # u5 never views — appears in no step
        (5, _ts(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r["users"] for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_cohort_retention_week_offsets(spark):
    rows = [
        # u1 first seen week of Jan 5 (Mon), active that week and 2 weeks later
        (1, dt.datetime(2026, 1, 6), "view"),
        (1, dt.datetime(2026, 1, 20), "view"),
        # u2 same cohort week, active only week 0 (two events, one distinct row)
        (2, dt.datetime(2026, 1, 7), "click"),
        (2, dt.datetime(2026, 1, 8), "view"),
        # u3 cohort week of Jan 12, active week 1
        (3, dt.datetime(2026, 1, 14), "view"),
        (3, dt.datetime(2026, 1, 21), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        (r["cohort_week"], r["week_offset"]): r["active_users"]
        for r in cohort(df).collect()
    }
    assert out == {
        ("2026-01-05", 0): 2,
        ("2026-01-05", 2): 1,
        ("2026-01-12", 0): 1,
        ("2026-01-12", 1): 1,
    }


def test_sorted_neighborhood_finds_exact_dups_and_is_subset_of_brute(spark):
    from pulsar_3_2_codedump_spark.functions.retrieval import (
        SNM_T,
        sorted_neighborhood_pairs,
    )

    from collections import defaultdict

    from pulsar_3_2_codedump_spark.catalog import load

    out = sorted_neighborhood_pairs(spark, SF_DIR)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    # exact duplicates sort adjacent -> every exact-dup pair must be found
    # (query runs the FULL corpus since r7 — no doc_id cap here either)
    docs = load(spark, SF_DIR, "documents")
    groups = defaultdict(list)
    for r in docs.select("doc_id", F.lower(F.trim(F.col("text"))).alias("t")).collect():
        groups[r["t"]].append(r["doc_id"])
    dup_pairs = set()
    for ids in groups.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                dup_pairs.add((ids[i], ids[j]))
    # exact dups are adjacent in sort order -> inside the window
    assert dup_pairs <= got
    # blocking is lossy but never invents: every reported pair really has J >= t
    shf = docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    x = shf.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = shf.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in x.join(y, F.col("doc_a") < F.col("doc_b")).filter(jac >= SNM_T)
        .select("doc_a", "doc_b").collect()
    }
    assert got <= brute


def test_fuzzy_blocking_pairs_matches_python_edit_distance(spark):
    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.retrieval import (
        FUZZY_MAX_DIST,
        FUZZY_PROBE_LEN,
        fuzzy_blocking_pairs,
    )
    from tests.conftest import SF_DIR

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = load(spark, SF_DIR, "documents").select("doc_id", "lang", "text").collect()
    recs = []
    for r in rows:
        norm = r["text"].lower().strip()
        blk = " ".join(norm.split()[:2])
        recs.append((r["doc_id"], r["lang"], blk, norm[:FUZZY_PROBE_LEN]))

    expect = set()
    for i, (da, la, ba, pa) in enumerate(recs):
        for db, lb, bb, pb in recs[i + 1:]:
            if la == lb and ba == bb:
                lo, hi = min(da, db), max(da, db)
                d = lev(pa, pb)
                if d <= FUZZY_MAX_DIST:
                    expect.add((lo, hi, la, d))

    got = {
        (r["doc_a"], r["doc_b"], r["lang"], r["edit_dist"])
        for r in fuzzy_blocking_pairs(spark, SF_DIR).collect()
    }
    assert got == expect
    assert expect, "fixture should produce at least one fuzzy link"
