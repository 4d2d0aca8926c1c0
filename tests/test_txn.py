"""§2.K transactional producer: buffer → all-or-nothing visibility →
commit/abort markers. Reference: TransactionCoordinator (NEW_TXN/END_TXN,
PulsarApi.proto:1026-1043), TopicTransactionBuffer.java:258 (visibility),
:301 (commit), :343 (abort discard); markers PulsarMarkers.proto.
"""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import topic as T
from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import (
    MARKER_TXN_ABORT,
    MARKER_TXN_COMMIT,
    wrap_events,
)
from tests.conftest import SF_DIR


def _env(spark, lo, hi):
    return (
        wrap_events(load(spark, SF_DIR, "events"))
        .filter(F.col("sequence_id").between(lo, hi - 1))
        .drop("partition", "offset")
    )


def test_txn_commit_all_or_nothing(spark, tmp_root):
    tp = T.create_topic(tmp_root, "txn", n_partitions=2)
    T.append(spark, _env(spark, 0, 30), tp, dedup=False)
    txn = T.txn_begin(tp)
    T.txn_append(spark, _env(spark, 30, 50), tp, txn)
    T.txn_append(spark, _env(spark, 50, 60), tp, txn)
    # open txn: invisible to every reader
    assert T.read_topic(spark, tp).count() == 30
    T.txn_commit(spark, tp, txn)
    # committed: all 30 buffered rows appear; commit marker hidden
    vis = T.read_topic(spark, tp)
    assert vis.count() == 60
    assert vis.filter(F.col("marker_type").isNotNull()).count() == 0
    internal = T.read_topic(spark, tp, read_markers=True)
    assert internal.filter(F.col("marker_type") == MARKER_TXN_COMMIT).count() == 1


def test_txn_abort_discards(spark, tmp_root):
    tp = T.create_topic(tmp_root, "txn2", n_partitions=2)
    T.append(spark, _env(spark, 0, 30), tp, dedup=False)
    txn = T.txn_begin(tp)
    T.txn_append(spark, _env(spark, 30, 60), tp, txn)
    T.txn_abort(spark, tp, txn)
    assert T.read_topic(spark, tp).count() == 30
    internal = T.read_topic(spark, tp, read_markers=True)
    assert internal.filter(F.col("marker_type") == MARKER_TXN_ABORT).count() == 1


def test_txn_commit_idempotent_replay(spark, tmp_root):
    """A replayed commit (coordinator retry after a crash between the data
    commit and the client ack) must not duplicate the data — batch_token =
    txn id dedups at the manifest."""
    tp = T.create_topic(tmp_root, "txn3", n_partitions=2)
    txn = T.txn_begin(tp)
    T.txn_append(spark, _env(spark, 0, 40), tp, txn)
    chunks_dir = f"{tp}/_txn_{txn}"
    import shutil
    shutil.copytree(chunks_dir, chunks_dir + "_replay")
    T.txn_commit(spark, tp, txn)
    n1 = T.read_topic(spark, tp).count()
    assert n1 == 40
    # replay: restore the buffer as the same txn and commit again
    shutil.copytree(chunks_dir + "_replay", chunks_dir)
    T.txn_commit(spark, tp, txn)
    assert T.read_topic(spark, tp).count() == n1
    # the commit marker is token-guarded: exactly ONE even after the replay
    internal = T.read_topic(spark, tp, read_markers=True)
    assert internal.filter(F.col("marker_type") == MARKER_TXN_COMMIT).count() == 1
    # a replay after the buffer sweep (no staging dir) is also a no-op
    T.txn_commit(spark, tp, txn)
    assert T.read_topic(spark, tp).count() == n1


def test_txn_abort_idempotent_and_validating(spark, tmp_root):
    """Abort replay safety (ADVICE r5): a replayed abort records exactly ONE
    marker (batch_token-guarded like commit); aborting an unknown txn or an
    already-committed txn raises instead of appending a bogus marker."""
    import pytest

    tp = T.create_topic(tmp_root, "txn4", n_partitions=2)
    txn = T.txn_begin(tp)
    T.txn_append(spark, _env(spark, 0, 20), tp, txn)
    T.txn_abort(spark, tp, txn)
    # replayed abort (coordinator retry after the buffer sweep): no-op
    T.txn_abort(spark, tp, txn)
    internal = T.read_topic(spark, tp, read_markers=True)
    assert internal.filter(F.col("marker_type") == MARKER_TXN_ABORT).count() == 1
    # unknown txn id: rejected
    with pytest.raises(ValueError):
        T.txn_abort(spark, tp, "deadbeef00000000")
    # abort AFTER a successful commit: rejected (status check, no 2nd marker)
    txn2 = T.txn_begin(tp)
    T.txn_append(spark, _env(spark, 20, 30), tp, txn2)
    T.txn_commit(spark, tp, txn2)
    with pytest.raises(ValueError):
        T.txn_abort(spark, tp, txn2)
    internal = T.read_topic(spark, tp, read_markers=True)
    assert internal.filter(F.col("marker_type") == MARKER_TXN_ABORT).count() == 1
    assert internal.filter(F.col("marker_type") == MARKER_TXN_COMMIT).count() == 1
