"""Registry-wide redundant-scan GATE (VERDICT r12 item 5).

The r12 waste class — a shared frame re-planned (and re-SCANNED) per plan
branch whenever its subtree has no Exchange root for ReuseExchange to
dedupe — recurred six times before tools/scan_audit.py existed. A tool you
must remember to run is not a gate, so this test runs the audit over the
WHOLE registry and fails on any >=4x same-fact-table scan plan that is
neither disciplined (persist / checkpoint / ckpt_unless_plan_only, which
the audit detects via plan markers OR the suppressed-checkpoint counter)
nor triaged in scan_audit.BENIGN_MULTISCAN with a stated class+reason.

The same sweep doubles as the action-free proof for the scan side
(VERDICT r12 item 2): constructing and planning every batch query under
SPARK_GRAFT_PLAN_ONLY must launch ZERO Spark execution jobs outside the
enumerated control-plane collects / fixture builds in
broadcast_audit.CONSTRUCTION_JOBS_OK (Spark's per-read parquet
footer-schema metadata reads, named 'parquet at ...', fire even for a
bare load() and are excluded by scan_audit.exec_jobs_after).
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from tests.conftest import SF_DIR


def test_registry_has_no_unclassified_multiscan_plans_and_sweep_runs_no_jobs(spark):
    from broadcast_audit import CONSTRUCTION_JOBS_OK
    from scan_audit import BENIGN_MULTISCAN, audit

    from pulsar_3_2_codedump_spark.queries import load_all

    jobs: dict = {}
    hits = audit(spark, load_all(), SF_DIR, jobs_out=jobs)

    # 1) zero execution jobs during the plan-only sweep outside the
    # enumerated control-plane/fixture-build queries (footer reads excluded
    # by exec_jobs_after)
    offenders = {n: js for n, js in jobs.items() if n not in CONSTRUCTION_JOBS_OK}
    assert not offenders, (
        f"plan-only scan sweep ran execution jobs outside "
        f"CONSTRUCTION_JOBS_OK: {offenders}"
    )
    for name, reason in CONSTRUCTION_JOBS_OK.items():
        assert reason and len(reason) > 20, name

    # 2) every hit is triaged — fail on any NEW >=4x fact-scan plan
    rogue = [h for h in hits if h[1] not in BENIGN_MULTISCAN]
    assert not rogue, (
        "untriaged >=4x same-fact-scan plans (fix with "
        "catalog.ckpt_unless_plan_only / persist_shared_corpus_frame / a "
        f"one-scan rewrite, or triage in BENIGN_MULTISCAN): {rogue}"
    )

    # 3) allowlist hygiene: entries carry a non-trivial documented reason
    for name, reason in BENIGN_MULTISCAN.items():
        assert reason and len(reason) > 20, name


def test_discipline_is_attributed_per_table(spark, monkeypatch):
    """ADVICE r13: a checkpoint of a control-plane frame must NOT excuse an
    unrelated fact table scanned >= threshold times — and a materialization
    whose subtree DOES read the multi-scanned table must. Both directions,
    on synthetic single-query registries."""
    from types import SimpleNamespace

    from scan_audit import audit

    from pulsar_3_2_codedump_spark.catalog import (
        ckpt_unless_plan_only,
        load,
    )

    def masked(s, sf):
        # discipline tick on a frame that reads NO fact table...
        ckpt_unless_plan_only(s.range(0, 10))
        ev = load(s, sf, "events").select("event_id", "user_id")
        # ...while the events table is unioned 4x (re-scanned per branch)
        u = ev
        for _ in range(3):
            u = u.unionByName(ev)
        return u.groupBy("user_id").count()

    def covered(s, sf):
        ev = ckpt_unless_plan_only(
            load(s, sf, "events").select("event_id", "user_id")
        )
        u = ev
        for _ in range(3):
            u = u.unionByName(ev)
        return u.groupBy("user_id").count()

    reg = lambda fn: {"probe": SimpleNamespace(fn=fn)}  # noqa: E731
    hits = audit(spark, reg(masked), SF_DIR)
    assert [h[1] for h in hits] == ["probe"], hits  # loophole now flags
    assert audit(spark, reg(covered), SF_DIR) == []  # real coverage excuses
