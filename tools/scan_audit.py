"""Registry-wide redundant-scan audit (r12).

Counts FileScan nodes per table in each registered query's INITIAL
physical plan and flags queries whose plan scans the SAME FACT TABLE
(orders / lineitem / events / documents / embeddings) >= THRESHOLD times
with NO materialization discipline visible (no InMemoryTableScan from a
persist, no ExistingRDD from a checkpoint/collect). This is the static
form of the waste class fixed in r12: a frame consumed by several plan
branches is re-planned — and re-SCANNED — per reference, invisible to
ReuseExchange whenever the shared subtree has no Exchange root
(TakeOrdered, plain filtered scans, chained per-stage aggregates).

Triage policy (a hit is a CANDIDATE, not automatically a bug):
  - REAL when the branches re-read the SAME rows/projection — fix with
    the persist-before-reuse discipline (catalog.ckpt_unless_plan_only;
    fixed this way in r12: ivfpq residual assignment, funnel stages,
    trigram train tokenization) or a one-scan rewrite when the branches
    are per-column/per-variant aggregates over one scan (column_profile's
    stack() form).
  - BENIGN when the branches carry DISJOINT pushed filters (per-event-
    type legs read disjoint row sets; N branch scans ~ one full scan),
    when the repeated scans are the documented measurement forms (recall/
    nDCG queries re-derive the brute-force truth side by design), or when
    a dim table repeats (broadcast-cheap at any scale).
  - Dims are excluded from the flag entirely; scans printed under a
    persist/checkpoint marker are cache-served at runtime (the audit
    skips any query whose plan shows the discipline, which slightly
    UNDER-counts queries that materialize one frame and rebuild another
    — read the per-table counts it prints, not just the flag).

Run: python tools/scan_audit.py [sf_dir] [threshold]
Plan-only (no actions): sets SPARK_GRAFT_PLAN_ONLY + ESD_NO_PROBE like
the flip audit, and skips streaming_/construction-executing queries.
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


def audit(spark, registry, sf: str, threshold: int = 4):
    from tools.broadcast_audit import CONSTRUCTION_EXECUTES

    os.environ["SPARK_GRAFT_PLAN_ONLY"] = "1"
    os.environ["SPARK_GRAFT_ESD_NO_PROBE"] = "1"
    hits = []
    try:
        for name, q in sorted(registry.items()):
            if name.startswith("streaming_") or name in CONSTRUCTION_EXECUTES:
                continue
            try:
                df = q.fn(spark, sf)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception:  # noqa: BLE001 — audit sweep, skip broken builds
                continue
            has_mat = "InMemoryTableScan" in plan or "ExistingRDD" in plan
            tabs: dict[str, int] = {}
            for s in re.findall(r"FileScan parquet[^\n]*", plan):
                m = re.search(rf"({'|'.join(TABLES)})\.parquet", s)
                t = m.group(1) if m else "?"
                tabs[t] = tabs.get(t, 0) + 1
            worst = max((v for k, v in tabs.items() if k in FACTS), default=0)
            if worst >= threshold and not has_mat:
                hits.append((worst, name, tabs))
    finally:
        os.environ.pop("SPARK_GRAFT_PLAN_ONLY", None)
        os.environ.pop("SPARK_GRAFT_ESD_NO_PROBE", None)
    return sorted(hits, reverse=True)


def main() -> None:
    from pulsar_3_2_codedump_spark.queries import load_all
    from pulsar_3_2_codedump_spark.session import get_spark

    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = positional[0] if positional else "/root/testdata/sf0.001"
    threshold = int(positional[1]) if len(positional) > 1 else 4
    spark = get_spark("scan_audit")
    for worst, name, tabs in audit(spark, load_all(), sf, threshold):
        print(worst, name, tabs)


if __name__ == "__main__":
    main()
