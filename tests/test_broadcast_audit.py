"""The broadcast-audit tool guards the 100x posture (no data-proportional
frame may ride a statically-planned BroadcastExchange — the r10 50M-smoke
crash class), so its plan parsing and classification rules get pinned here
on canned plan strings. No Spark needed."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from broadcast_audit import audit_plan, audit_plan_rich, subtree

from tests.conftest import SF_DIR

FACT_BUILD = """AdaptiveSparkPlan isFinalPlan=false
+- SortMergeJoin [ng#1], [ng#2], Inner
   :- Sort [ng#1 ASC NULLS FIRST], false, 0
   :  +- Exchange hashpartitioning(ng#1, 32)
   :     +- FileScan parquet [doc_id#0,ng#1] ... documents.parquet
   +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, string, true]),false)
      +- HashAggregate(keys=[ng#2], functions=[count(distinct doc_id#3L)])
         +- Exchange hashpartitioning(ng#2, 32)
            +- FileScan parquet [doc_id#3L,ng#2] ... documents.parquet
"""

LIMIT_BUILD = FACT_BUILD.replace(
    "+- HashAggregate(keys=[ng#2], functions=[count(distinct doc_id#3L)])",
    "+- GlobalLimit 100\n         +- HashAggregate(keys=[ng#2], functions=[count(distinct doc_id#3L)])",
)

SCALAR_BUILD = FACT_BUILD.replace(
    "HashAggregate(keys=[ng#2], functions=[count(distinct doc_id#3L)])",
    "HashAggregate(keys=[], functions=[sum(v#9L)])",
)

DIM_BUILD = FACT_BUILD.replace("documents.parquet", "nation.parquet").replace(
    "documents", "nation"
)


def test_fact_backed_keyed_aggregate_build_is_flagged():
    hits = audit_plan(FACT_BUILD)
    assert len(hits) == 1 and hits[0][0] == ["documents"]
    rich = audit_plan_rich(FACT_BUILD)
    assert len(rich) == 1
    fact, keys, _root = rich[0]
    assert fact == ["documents"] and keys == ["ng"]


COLLECT_LIMIT_BUILD = FACT_BUILD.replace(
    "+- HashAggregate(keys=[ng#2], functions=[count(distinct doc_id#3L)])",
    "+- CollectLimit 100\n         +- HashAggregate(keys=[ng#2], functions=[count(distinct doc_id#3L)])",
)

# fact-name SUFFIX in an identifier (e.g. a derived column preorders#12)
# must not trip the fact matcher — requires a LEFT word boundary too
SUFFIX_NAME_BUILD = FACT_BUILD.replace("documents", "predocuments")


def test_limit_scalar_and_dim_builds_are_not_flagged():
    assert audit_plan(LIMIT_BUILD) == []          # bounded by construction
    assert audit_plan_rich(SCALAR_BUILD) == []    # one-row threshold
    assert audit_plan(DIM_BUILD) == []            # dimension scan, not a fact
    assert audit_plan(COLLECT_LIMIT_BUILD) == []  # CollectLimit is Limit-bounded
    assert audit_plan(SUFFIX_NAME_BUILD) == []    # identifier merely ends in a fact name


def test_flip_audit_only_allowlisted_fact_broadcasts_survive(spark):
    """The class-(b) pin (VERDICT r10 item 3): every fact-backed broadcast
    in the registry must be ESTIMATE-DRIVEN — plan the whole registry with
    the broadcast threshold floored (-1, the 100TB condition where every
    corpus-derived frame's estimate exceeds any threshold) and assert the
    only builds still broadcasting are the explicit, documented measurement
    forms in EXPLICIT_MEASUREMENT_BROADCASTS. Catches any future explicit
    F.broadcast()/hint('BROADCAST') of a data-proportional frame at plan
    time — this test found six TPC-H shapes broadcasting ORDERS when first
    written. Plan-only by contract (ADVICE r11): queries whose fn() runs
    Spark jobs at construction time are excluded via CONSTRUCTION_EXECUTES
    (reasons documented there), and the sweep disables the ESD census
    probe via SPARK_GRAFT_ESD_NO_PROBE; ~2 min for the full registry."""
    from broadcast_audit import (
        CONSTRUCTION_JOBS_OK,
        EXPLICIT_MEASUREMENT_BROADCASTS,
        flip_audit,
    )
    from pulsar_3_2_codedump_spark.queries import load_all

    jobs: dict = {}
    flagged = flip_audit(spark, load_all(), SF_DIR, jobs_out=jobs)
    # VERDICT r12 item 2: the sweep is action-free — constructing and
    # planning every batch query launches ZERO execution jobs, except the
    # enumerated control-plane collects / fixture builds in
    # CONSTRUCTION_JOBS_OK (parquet footer-schema metadata reads are
    # excluded by exec_jobs_after — they fire even for a bare load()).
    offenders = {n: js for n, js in jobs.items() if n not in CONSTRUCTION_JOBS_OK}
    assert not offenders, (
        f"plan-only flip sweep ran execution jobs outside "
        f"CONSTRUCTION_JOBS_OK: {offenders}"
    )
    skips = {n: h for n, h in flagged.items() if h and h[0][0] == "SKIP"}
    assert not skips, f"flip audit could not plan: {skips}"
    rogue = set(flagged) - set(EXPLICIT_MEASUREMENT_BROADCASTS)
    assert not rogue, (
        f"fact-backed broadcasts survive a floored threshold outside the "
        f"documented allowlist: { {n: flagged[n] for n in sorted(rogue)} }"
    )
    # every allowlist entry must carry a non-empty documented reason
    for name, reason in EXPLICIT_MEASUREMENT_BROADCASTS.items():
        assert reason and len(reason) > 20, name


# ADVICE r11 item 1: a join-rooted BUILD whose first branch is
# Limit-bounded but whose sibling branch is a raw fact scan — the old
# print-order classifier took the first Limit as size-determining and
# passed the whole build; the branch-aware classifier must flag it.
JOIN_BUILD_LIMIT_FIRST_BRANCH = """AdaptiveSparkPlan isFinalPlan=false
+- SortMergeJoin [ng#1], [ng#2], Inner
   :- Sort [ng#1 ASC NULLS FIRST], false, 0
   :  +- Exchange hashpartitioning(ng#1, 32)
   :     +- FileScan parquet [doc_id#0,ng#1] ... documents.parquet
   +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, string, true]),false)
      +- BroadcastHashJoin [w#5], [w#6], Inner, BuildLeft
         :- GlobalLimit 100
         :  +- Sort [cnt#7L DESC NULLS LAST], true, 0
         :     +- HashAggregate(keys=[w#5], functions=[count(1)])
         :        +- FileScan parquet [w#5] ... documents.parquet
         +- Project [ng#2, w#6]
            +- FileScan parquet [ng#2,w#6] ... documents.parquet
"""

# same shape, but the sibling branch is bounded too (a one-row agg):
JOIN_BUILD_BOTH_BOUNDED = JOIN_BUILD_LIMIT_FIRST_BRANCH.replace(
    """         +- Project [ng#2, w#6]
            +- FileScan parquet [ng#2,w#6] ... documents.parquet""",
    """         +- HashAggregate(keys=[], functions=[sum(v#9L)])
            +- FileScan parquet [v#9L] ... documents.parquet""",
)

# ADVICE r11 item 2: a fact aggregate keyed by a GENERIC name ('bucket' —
# e.g. an ESD substr(suffix) key that grows with the corpus) must not
# slip through the global bounded-key set; a query that genuinely uses
# the name for a domain-bounded key qualifies it in QUERY_BOUNDED_KEYS.
GENERIC_KEY_BUILD = FACT_BUILD.replace(
    "HashAggregate(keys=[ng#2]", "HashAggregate(keys=[bucket#2]"
)


def test_join_build_classifies_each_branch():
    rich = audit_plan_rich(JOIN_BUILD_LIMIT_FIRST_BRANCH)
    assert len(rich) == 1, rich
    fact, keys, _root = rich[0]
    assert fact == ["documents"] and "<fact-scan>" in keys
    assert audit_plan_rich(JOIN_BUILD_BOTH_BOUNDED) == []


def test_generic_key_names_are_not_globally_bounded():
    rich = audit_plan_rich(GENERIC_KEY_BUILD)
    assert len(rich) == 1 and rich[0][1] == ["bucket"]
    # per-query qualification path: the same plan under a query that
    # declares its 'bucket' domain-bounded passes
    from broadcast_audit import QUERY_BOUNDED_KEYS

    QUERY_BOUNDED_KEYS["__canned__"] = {"bucket"}
    try:
        assert audit_plan_rich(GENERIC_KEY_BUILD, query="__canned__") == []
    finally:
        del QUERY_BOUNDED_KEYS["__canned__"]


def test_subtree_stops_at_sibling_depth():
    lines = FACT_BUILD.splitlines()
    i = next(n for n, ln in enumerate(lines) if "BroadcastExchange" in ln)
    sub = "\n".join(subtree(lines, i))
    assert "HashAggregate" in sub
    # the probe side (shallower/equal depth) is not part of the build subtree
    assert "SortMergeJoin" not in sub and "Sort [ng#1" not in sub


# ADVICE r13: cut_plan_only's empty-RDD leaf hid the cut subtrees'
# explicit broadcasts and fact scans from the flip audit. This pass
# re-plans every cut-using query with SPARK_GRAFT_PLAN_ONLY_NO_CUT=1
# (identity mode even for cut-marked frames) so those subtrees are
# judged too. connected_components/greedy/BPE-class loop-carried builds
# are tractable here because the fixture unrolls are bounded; if a new
# query's identity plan becomes intractable, exclude it HERE with the
# reason, not by silently relying on the cut.
NO_CUT_AUDITED = [
    "nn_descent_graph_convergence",
    "suffix_longest_match_doubling",
    "cross_corpus_overlap_spans",
    "funnel_within_window",
    "kmeans_lloyd_iterations",
    "pca_power_iteration",
    "ivfpq_residual_topk",
    "tfidf_top_terms",
    "bpe_train_merges",
    "connected_components_star",
    "dedup_clusters",
    "greedy_coverage_selection",
    "event_trigram_paths",
    "duplicated_ngram_coverage",
    "psi_drift",
    "bloom_filter_semi_join",
    "hnsw_beam_search_recall",
]


def test_flip_audit_sees_through_plan_only_cuts(spark, monkeypatch):
    """The cut-subtree blind spot stays closed: with cuts disabled, the
    flip audit (floored broadcast threshold) over every cut-using query
    must find no unqualified fact-backed broadcast inside the subtrees the
    normal sweeps cannot see (the bloom word table, the HNSW entry-strata
    targets, the capped ANN query sets)."""
    from broadcast_audit import flip_audit

    from pulsar_3_2_codedump_spark.queries import load_all

    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY_NO_CUT", "1")
    flagged = flip_audit(spark, load_all(), SF_DIR, only=NO_CUT_AUDITED)
    assert not flagged, flagged


def test_capped_query_set_filter_is_bounded():
    """The ANN broadcast-queries contract is visible to the classifier: a
    build whose spine filters on BOTH the stride modulus and the id cap is
    bounded (<= ANN_MAX_QUERIES rows at any corpus size); either predicate
    alone is not."""
    from broadcast_audit import audit_plan_rich

    from pulsar_3_2_codedump_spark.functions.similarity import (
        QUERY_ID_CAP,
        QUERY_STRIDE,
    )

    capped = f"""AdaptiveSparkPlan isFinalPlan=false
+- SortMergeJoin [ng#1], [ng#2], Inner
   :- Sort [ng#1 ASC NULLS FIRST], false, 0
   :  +- Exchange hashpartitioning(ng#1, 32)
   :     +- FileScan parquet [doc_id#0,ng#1] ... documents.parquet
   +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, false]),false)
      +- Project [vec_id#3L AS query_id#9L]
         +- Filter (((vec_id#3L % {QUERY_STRIDE}) = 0) AND (vec_id#3L < {QUERY_ID_CAP}))
            +- FileScan parquet [vec_id#3L] ... embeddings.parquet
"""
    assert audit_plan_rich(capped) == []
    stride_only = capped.replace(f" AND (vec_id#3L < {QUERY_ID_CAP})", "")
    assert len(audit_plan_rich(stride_only)) == 1
