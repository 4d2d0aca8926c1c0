"""Reservoir-per-group, importance resampling, n-gram novelty (§2.N)."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.functions.retrieval import ngram_novelty
from pulsar_3_2_codedump_spark.functions.sampling import (
    IR_PIVOT,
    RESERVOIR_K,
    importance_resampling,
    reservoir_sample_per_group,
    uniform_hash01,
)
from tests.conftest import SF_DIR


def test_reservoir_exactly_k_per_group_and_deterministic(spark):
    out1 = reservoir_sample_per_group(spark, SF_DIR)
    sizes = {r["source"]: r["n"] for r in out1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_sources = load(spark, SF_DIR, "documents").select("source").distinct().count()
    assert len(sizes) == n_sources
    assert all(v == RESERVOIR_K for v in sizes.values())
    # deterministic: a second run returns the identical id set
    ids1 = {(r["source"], r["doc_id"]) for r in out1.collect()}
    ids2 = {(r["source"], r["doc_id"]) for r in reservoir_sample_per_group(spark, SF_DIR).collect()}
    assert ids1 == ids2


def test_importance_resampling_long_docs_always_kept(spark):
    docs = load(spark, SF_DIR, "documents")
    kept_total = importance_resampling(spark, SF_DIR).agg(F.sum("n_kept")).collect()[0][0]
    # every saturated-probability doc (p=1) must be kept
    p = F.least(F.col("n_chars") / F.lit(IR_PIVOT), F.lit(1.0))
    saturated = docs.filter(F.col("n_chars") >= IR_PIVOT).count()
    manual = docs.filter(uniform_hash01(F.col("doc_id")) < p).count()
    assert kept_total == manual
    assert manual >= saturated


def test_ngram_novelty_bounds_and_dup_docs_score_zero(spark):
    out = ngram_novelty(spark, SF_DIR)
    agg = out.agg(F.min("novel_frac"), F.max("novel_frac"), F.count(F.lit(1))).collect()[0]
    assert 0.0 <= agg[0] and agg[1] <= 1.0
    assert agg[2] == load(spark, SF_DIR, "documents").count()
    # exact-duplicate docs share every shingle -> their df>=2 everywhere -> 0
    docs = load(spark, SF_DIR, "documents")
    dups = (
        docs.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .agg(F.count(F.lit(1)).alias("c"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("c") >= 2)
        .select(F.explode("ids").alias("doc_id"))
    )
    dup_scores = out.join(dups, "doc_id").agg(F.max("novel_frac")).collect()[0][0]
    if dup_scores is not None:  # fixture has dup clusters at every sf
        assert dup_scores == 0.0


def test_token_balanced_shards_partition_the_corpus(spark):
    from pulsar_3_2_codedump_spark.functions.sampling import (
        SHARD_TARGET_TOKENS,
        token_balanced_shards,
    )

    rows = sorted(token_balanced_shards(spark, SF_DIR).collect(),
                  key=lambda r: r["shard_id"])
    docs = load(spark, SF_DIR, "documents")
    total_docs = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
    ).collect()[0][0]
    assert sum(r["n_docs"] for r in rows) == total_docs
    assert sum(r["shard_tokens"] for r in rows) == total_tokens
    # contiguous shard ids and every FULL shard lands near the target
    # (one doc of overshoot allowed; the last shard holds the remainder)
    assert [r["shard_id"] for r in rows] == list(range(len(rows)))
    max_doc = docs.select(
        F.max(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
    ).collect()[0][0]
    for r in rows[:-1]:
        assert SHARD_TARGET_TOKENS - max_doc < r["shard_tokens"] <= SHARD_TARGET_TOKENS + max_doc


def test_source_cap_binds_and_keeps_best(spark):
    from pulsar_3_2_codedump_spark.functions.sampling import (
        SOURCE_CAP,
        source_cap_sample,
    )

    out = {r["source"]: r for r in source_cap_sample(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents")
    per_src = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert set(out) == set(per_src)
    for src, r in out.items():
        assert r["n_kept"] == min(SOURCE_CAP, per_src[src]["n"])
        assert r["cap_hit"] == (per_src[src]["n"] > SOURCE_CAP)
        # kept docs are the BEST by n_chars: their total beats any other
        # n_kept-sized subset's minimum possible — check vs the true top-K sum
        top = (
            docs.filter(F.col("source") == src)
            .orderBy(F.desc("n_chars"), F.asc("doc_id"))
            .limit(SOURCE_CAP)
            .agg(F.sum("n_chars"))
            .collect()[0][0]
        )
        assert r["kept_chars"] == top


def test_token_budget_selection_is_greedy_prefix(spark):
    from pulsar_3_2_codedump_spark.functions.sampling import (
        TOKEN_BUDGET_FRAC,
        token_budget_selection,
    )
    from pulsar_3_2_codedump_spark.functions.text import token_count

    out = token_budget_selection(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars", token_count(F.col("text")).alias("tok")
    )
    rows = sorted(
        docs.collect(), key=lambda r: (-r["n_chars"], r["doc_id"])
    )
    total = sum(r["tok"] for r in rows)
    budget = TOKEN_BUDGET_FRAC * total
    # sequential greedy reference: keep while tokens consumed BEFORE < budget
    kept, tokens_kept, prior = 0, 0, 0
    for r in rows:
        if prior < budget:
            kept += 1
            tokens_kept += r["tok"]
        prior += r["tok"]
    assert sum(r["n_kept"] for r in out) == kept
    assert sum(r["tokens_kept"] for r in out) == tokens_kept
    # the budget binds: something kept, something dropped
    assert 0 < kept < len(rows)


def test_kfold_assignment_partitions_every_language(spark):
    import hashlib

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.sampling import (
        KFOLD_K,
        kfold_assignment,
    )
    from tests.conftest import SF_DIR

    out = kfold_assignment(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars").collect()

    # independent recomputation of the md5 fold assignment
    def fold(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % KFOLD_K

    from collections import defaultdict
    want = defaultdict(lambda: [0, 0])
    for r in docs:
        k = (r["lang"], fold(r["doc_id"]))
        want[k][0] += 1
        want[k][1] += r["n_chars"]
    got = {(r["lang"], r["fold"]): r for r in out}
    assert set(got) == set(want)
    for k, (n, chars) in want.items():
        assert got[k]["n_docs"] == n, k
        assert got[k]["total_chars"] == chars, k
    # shares sum to ~1 within each language
    from collections import Counter
    share = Counter()
    for r in out:
        assert 0 <= r["fold"] < KFOLD_K
        share[r["lang"]] += r["fold_share"]
    for lang, s in share.items():
        assert abs(s - 1.0) < 0.001, (lang, s)


def test_greedy_coverage_selection_matches_sequential_greedy(spark):
    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.sampling import (
        GREEDY_STEPS,
        greedy_coverage_selection,
    )
    from tests.conftest import SF_DIR

    rows = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    inc = {}
    for r in rows:
        ws = r["text"].lower().strip().split()
        n = max(len(ws) - 2, 1)
        inc[r["doc_id"]] = {" ".join(ws[i:i + 3]) for i in range(n)}

    covered, selected, expect = set(), set(), []
    for step in range(1, GREEDY_STEPS + 1):
        best = min(
            ((d, len(sh - covered)) for d, sh in inc.items() if d not in selected),
            key=lambda kv: (-kv[1], kv[0]),
        )
        expect.append((step, best[0], best[1]))
        covered |= inc[best[0]]
        selected.add(best[0])

    got = sorted(
        [(r["step"], r["doc_id"], r["marginal_gain"])
         for r in greedy_coverage_selection(spark, SF_DIR).collect()]
    )
    assert got == expect
