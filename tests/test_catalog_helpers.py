"""Unit pins for the two materialization-discipline primitives every
multi-consumer query build routes through (r13): their contracts are
load-bearing for both the audit gates and the 100 TB posture, so the
exact behaviors are pinned here on tiny frames."""

import os

import pytest

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import catalog


@pytest.fixture()
def df(spark):
    return spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_ckpt_product_mode_materializes_and_truncates(df, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY", raising=False)
    out = catalog.ckpt_unless_plan_only(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, plan  # lineage truncated to the checkpoint
    assert sorted(r["v"] for r in out.collect()) == [2 * i for i in range(10)]


def test_ckpt_plan_only_identity_ticks_counter_and_runs_no_jobs(df, monkeypatch):
    from tools.scan_audit import exec_jobs_after, max_job_id

    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY", "1")
    spark = df.sparkSession
    c0 = catalog.PLAN_ONLY_SUPPRESSED_CKPTS
    mark = max_job_id(spark)
    out = catalog.ckpt_unless_plan_only(df)
    assert catalog.PLAN_ONLY_SUPPRESSED_CKPTS == c0 + 1  # audit sees discipline
    assert exec_jobs_after(spark, mark) == []            # zero execution jobs
    # identity: the flip audit judges the REAL build lineage
    assert out is df


def test_ckpt_plan_only_cut_is_schema_preserving_nonempty_leaf(df, monkeypatch):
    from tools.scan_audit import exec_jobs_after, max_job_id

    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY", "1")
    spark = df.sparkSession
    c0 = catalog.PLAN_ONLY_SUPPRESSED_CKPTS
    mark = max_job_id(spark)
    out = catalog.ckpt_unless_plan_only(df, cut_plan_only=True)
    assert catalog.PLAN_ONLY_SUPPRESSED_CKPTS == c0 + 1
    assert exec_jobs_after(spark, mark) == []
    assert out.schema == df.schema
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the same Scan ExistingRDD marker an EXECUTED checkpoint leaves, so
    # audited plan shapes match product topology
    assert "ExistingRDD" in plan, plan
    # and crucially NOT a statically-empty LocalRelation: downstream ops
    # must not be collapsed by PropagateEmptyRelation
    joined_plan = (
        df.join(out.withColumnRenamed("v", "v2"), "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LocalTableScan <empty>" not in joined_plan, joined_plan
    assert "Join" in joined_plan or "join" in joined_plan, joined_plan


def test_persist_shared_corpus_frame_is_lazy_disk_only_with_lineage(df, monkeypatch):
    from pyspark import StorageLevel

    from tools.scan_audit import exec_jobs_after, max_job_id

    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY", raising=False)
    spark = df.sparkSession
    mark = max_job_id(spark)
    out = catalog.persist_shared_corpus_frame(df)
    # lazy: no jobs at construction — planning sweeps need no gating
    assert exec_jobs_after(spark, mark) == []
    assert out.storageLevel == StorageLevel.DISK_ONLY
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the discipline marker scan_audit recognizes, visible pre-execution
    assert "InMemoryTableScan" in plan, plan
    assert sorted(r["v"] for r in out.collect()) == [2 * i for i in range(10)]
    out.unpersist(blocking=True)

def test_release_shared_frames_unpersists_and_clears_tracker(df, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY", raising=False)
    n0 = len(catalog._SHARED_FRAMES)
    a = catalog.persist_shared_corpus_frame(df)
    b = catalog.persist_shared_corpus_frame(df.select("id"))
    assert len(catalog._SHARED_FRAMES) == n0 + 2
    a.count()  # materialize one so there are real blocks to drop
    released = catalog.release_shared_frames(blocking=True)
    assert released == n0 + 2
    assert catalog._SHARED_FRAMES == []
    # both frames really left the CacheManager (lifecycle, ADVICE r13):
    # a re-built identical plan must NOT show an InMemoryTableScan splice
    assert a.storageLevel.useMemory is False and a.storageLevel.useDisk is False
    assert b.storageLevel.useMemory is False and b.storageLevel.useDisk is False
    # idempotent / safe to call with nothing outstanding
    assert catalog.release_shared_frames() == 0
