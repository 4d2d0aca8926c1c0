"""Registry-wide redundant-scan audit (r12; r13: discipline-aware + pytest gate).

Counts FileScan nodes per table in each registered query's INITIAL
physical plan and flags queries whose plan scans the SAME FACT TABLE
(orders / lineitem / events / documents / embeddings) >= THRESHOLD times
with NO materialization discipline. This is the static form of the waste
class fixed in r12: a frame consumed by several plan branches is
re-planned — and re-SCANNED — per reference, invisible to ReuseExchange
whenever the shared subtree has no Exchange root (TakeOrdered, plain
filtered scans, chained per-stage aggregates).

Discipline detection (ADVICE r12 — the audit must SEE the fix it
prescribes): a query counts as disciplined when EITHER
  - its plan shows a materialization marker (InMemoryTableScan from a
    persist, ExistingRDD from a checkpoint/collect/plan-only cut), OR
  - constructing it under SPARK_GRAFT_PLAN_ONLY ticked
    catalog.PLAN_ONLY_SUPPRESSED_CKPTS — i.e. the build routes through
    catalog.ckpt_unless_plan_only, whose identity mode deliberately
    leaves the raw (multi-scan) lineage in the audited plan so the flip
    audit can judge the build subtree. Without the counter the audit
    permanently false-positived the very queries the discipline fixed
    (funnel_within_window, bootstrap_median_replicates, ... — the r12
    sweep re-flagged all of them at HEAD).

Triage policy (a hit is a CANDIDATE, not automatically a bug):
  - REAL when the branches re-read the SAME rows/projection — fix with
    catalog.ckpt_unless_plan_only (bounded/loop-carried frames) or
    catalog.persist_shared_corpus_frame (corpus-sized frames), or a
    one-scan rewrite when the branches are per-column/per-variant
    aggregates over one scan (column_profile's stack() form).
  - BENIGN when the branches carry DISJOINT pushed filters (per-event-
    type legs read disjoint row sets; N branch scans ~ one full scan),
    or when the repeated scans are the documented measurement forms
    (recall/nDCG queries re-derive the brute-force truth side by
    design). These are enumerated with reasons in BENIGN_MULTISCAN; the
    pytest gate (tests/test_scan_audit.py) fails on any hit OUTSIDE it.
  - Dims are excluded from the flag entirely (broadcast-cheap repeats).

Run: python tools/scan_audit.py [sf_dir] [threshold]
Plan-only: sets SPARK_GRAFT_PLAN_ONLY + ESD_NO_PROBE like the flip
audit, and skips streaming_/construction-executing queries.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ("orders", "lineitem", "events", "documents", "embeddings")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
) + FACTS

# Queries allowed to keep a >=4x same-fact-scan plan, with the reason a
# materialize-once rewrite would be WRONG or pointless for them. The
# pytest gate fails on any hit not listed here — the r12 class recurred
# six times before the audit existed; a tool you must remember to run is
# not a gate (VERDICT r12 item 5).
BENIGN_MULTISCAN: dict[str, str] = {
    "sessionize_events": (
        "disjoint per-event_type filter legs — each scan reads a disjoint "
        "row set under a pushed filter, so N branch scans ~ one full scan; "
        "materializing the union would REMOVE the pushdown"
    ),
    "retention_cohorts": (
        "disjoint per-week cohort legs, each under a pushed ts-range "
        "filter — same disjoint-rows argument as sessionize_events"
    ),
    "ann_recall_at_k": (
        "measurement form: re-derives the brute-force truth side against "
        "the approximate side by design — the two scans ARE the comparison"
    ),
    "ann_ndcg_at_k": (
        "measurement form: brute-force truth side re-derived by design"
    ),
}


def audit(spark, registry, sf: str, threshold: int = 4):
    from tools.broadcast_audit import CONSTRUCTION_EXECUTES

    from pulsar_3_2_codedump_spark import catalog

    os.environ["SPARK_GRAFT_PLAN_ONLY"] = "1"
    os.environ["SPARK_GRAFT_ESD_NO_PROBE"] = "1"
    hits = []
    try:
        for name, q in sorted(registry.items()):
            if name.startswith("streaming_") or name in CONSTRUCTION_EXECUTES:
                continue
            ckpt0 = catalog.PLAN_ONLY_SUPPRESSED_CKPTS
            try:
                df = q.fn(spark, sf)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception:  # noqa: BLE001 — audit sweep, skip broken builds
                continue
            disciplined = (
                "InMemoryTableScan" in plan
                or "ExistingRDD" in plan
                or catalog.PLAN_ONLY_SUPPRESSED_CKPTS > ckpt0
            )
            tabs: dict[str, int] = {}
            for s in re.findall(r"FileScan parquet[^\n]*", plan):
                m = re.search(rf"({'|'.join(TABLES)})\.parquet", s)
                t = m.group(1) if m else "?"
                tabs[t] = tabs.get(t, 0) + 1
            worst = max((v for k, v in tabs.items() if k in FACTS), default=0)
            if worst >= threshold and not disciplined:
                hits.append((worst, name, tabs))
    finally:
        os.environ.pop("SPARK_GRAFT_PLAN_ONLY", None)
        os.environ.pop("SPARK_GRAFT_ESD_NO_PROBE", None)
    return sorted(hits, reverse=True)


def unclassified_hits(spark, registry, sf: str, threshold: int = 4):
    """Hits outside BENIGN_MULTISCAN — what the pytest gate fails on."""
    return [h for h in audit(spark, registry, sf, threshold) if h[1] not in BENIGN_MULTISCAN]


def main() -> None:
    from pulsar_3_2_codedump_spark.queries import load_all
    from pulsar_3_2_codedump_spark.session import get_spark

    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = positional[0] if positional else "/root/testdata/sf0.001"
    threshold = int(positional[1]) if len(positional) > 1 else 4
    spark = get_spark("scan_audit")
    for worst, name, tabs in audit(spark, load_all(), sf, threshold):
        tag = "BENIGN" if name in BENIGN_MULTISCAN else "UNCLASSIFIED"
        print(worst, name, tabs, tag)


if __name__ == "__main__":
    main()
