"""Individual-ack cursor semantics (§2.J3): hole closing, cumulative acks,
range-cap redelivery, state persistence — mirrors the behavioral assertions
of the reference's cursor tests (markDeletePosition + individualDeletedMessages,
ManagedCursorImpl.java:131,199,1842)."""

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark import subscriptions as S


def _ids(df):
    return {(r["partition"], r["offset"]) for r in df.collect()}


def test_condense_ranges_gap_and_island(spark):
    acks = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 5), (0, 6), (0, 9), (1, 3)],
        "partition int, offset long",
    )
    got = {(r["partition"], r["lo"], r["hi"]) for r in S.condense_ranges(acks).collect()}
    assert got == {(0, 0, 2), (0, 5, 6), (0, 9, 9), (1, 3, 3)}


def test_hole_closing_advances_mark_delete():
    st = S.ack_individual(S.new_ack_state(), [(0, 0, 2), (0, 5, 6)])
    assert st[0]["mark_delete"] == 2 and st[0]["ranges"] == [[5, 6]]
    # acking the hole 3..4 merges everything through 6 into the mark
    S.ack_individual(st, [(0, 3, 4)])
    assert st[0]["mark_delete"] == 6 and st[0]["ranges"] == []


def test_cumulative_ack_subsumes_and_touches_ranges():
    st = S.ack_individual(S.new_ack_state(), [(0, 4, 5), (0, 8, 9), (0, 20, 21)])
    S.ack_cumulative(st, 0, 7)  # swallows [4,5]; touches [8,9] → mark = 9
    assert st[0]["mark_delete"] == 9 and st[0]["ranges"] == [[20, 21]]
    S.ack_cumulative(st, 0, 3)  # mark never regresses (ManagedCursorImpl.java:1843)
    assert st[0]["mark_delete"] == 9


def test_range_cap_forgets_highest_ranges_at_least_once():
    # 3 holes → 3 surviving ranges; cap=2 forgets the HIGHEST range, so its
    # messages fall back into the redelivery set (at-least-once, the
    # managedLedgerMaxUnackedRangesToPersist=10000 overflow behavior)
    st = S.ack_individual(
        S.new_ack_state(), [(0, 2, 3), (0, 6, 7), (0, 10, 11), (0, 14, 15)], max_ranges=2
    )
    assert st[0]["ranges"] == [[2, 3], [6, 7]]


def test_save_load_roundtrip(tmp_path):
    st = S.ack_individual(S.new_ack_state(), [(0, 0, 4), (2, 7, 9)])
    p = str(tmp_path / "cursor.json")
    S.save_ack_state(st, p)
    assert S.load_ack_state(p) == st


def test_unacked_is_log_minus_cursor(spark):
    env = spark.range(0, 40).select(
        (F.col("id") % 2).cast("int").alias("partition"),
        (F.col("id") / 2).cast("long").alias("offset"),
    )
    st = S.ack_individual(S.new_ack_state(), [(0, 0, 4), (0, 7, 8), (1, 3, 19)])
    S.ack_cumulative(st, 1, 1)
    got = _ids(S.unacked(spark, env, st))
    expected = {(0, o) for o in [5, 6, *range(9, 20)]} | {(1, 2)}
    assert got == expected


def test_unacked_empty_state_returns_everything(spark):
    env = spark.createDataFrame([(0, 0), (0, 1)], "partition int, offset long")
    assert _ids(S.unacked(spark, env, S.new_ack_state())) == {(0, 0), (0, 1)}


def test_translate_cursor_preserves_unacked_set_across_repartition(spark, tmp_root):
    """L2 replicated subscriptions: a cursor translated to a replica topic
    with DIFFERENT partitioning covers exactly the same messages — the
    unacked (redelivery) identity sets coincide (the invariant the
    reference's snapshot markers only approximate)."""
    from pulsar_3_2_codedump_spark import topic as T
    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.envelope import wrap_events
    from tests.conftest import SF_DIR

    rows = (
        wrap_events(load(spark, SF_DIR, "events"))
        .filter(F.col("sequence_id") < 400)
        .drop("partition", "offset")
    )
    src_tp = T.create_topic(tmp_root, "cluster_a", n_partitions=2)
    dst_tp = T.create_topic(tmp_root, "cluster_b", n_partitions=3)
    T.append(spark, rows, src_tp)
    T.append(spark, rows, dst_tp)
    src_env = T.read_topic(spark, src_tp)
    dst_env = T.read_topic(spark, dst_tp)

    acks = src_env.filter(F.col("sequence_id") % 5 != 0).select("partition", "offset")
    src_state = S.ack_individual(S.new_ack_state(), S.condense_ranges(acks))

    dst_state = S.translate_cursor(spark, src_env, dst_env, src_state)

    def idset(env, st):
        return {
            r["sequence_id"] for r in S.unacked(spark, env, st).select("sequence_id").collect()
        }

    src_unacked = idset(src_env, src_state)
    assert src_unacked == {s for s in range(400) if s % 5 == 0}
    assert idset(dst_env, dst_state) == src_unacked
