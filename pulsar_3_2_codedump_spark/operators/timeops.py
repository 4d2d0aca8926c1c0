"""Time-based operators (SURVEY §2.F): delayed delivery, TTL, seek, last-id.

Reference:
  - Delayed delivery: ``deliver_at_time`` metadata (PulsarApi.proto:143); the
    broker tracker holds (ledger, entry, deliverAt) in a priority queue and
    releases due messages (pulsar-broker/.../delayed/
    InMemoryDelayedDeliveryTracker.java:34,70,117; spillable variant
    bucket/BucketDelayedDeliveryTracker.java).
  - TTL/expiry: cursor advances past messages older than the TTL
    (PersistentMessageExpiryMonitor.java:44,77).
  - Seek by timestamp: binary search for first entry with publish_time ≥ ts
    (PersistentMessageFinder.java:37,57; OpFindNewest.java).
  - Last message id: GET_LAST_MESSAGE_ID (ServerCnx.java:2147).

Spark re-expression: every one of these is a *predicate or aggregate over the
envelope*, which Catalyst pushes into the parquet scan. Seek-by-timestamp is
literally free at 100 TB: parquet min/max row-group stats prune the log the
same way Pulsar's OpFindNewest binary-searches it. The streaming form of
delayed delivery (event-time timers) lives in streaming/delayed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.envelope import EVENTS_ENVELOPE_ORACLE, cached_envelope
from pulsar_3_2_codedump_spark.queries import query

_ENV = f"WITH envelope AS ({EVENTS_ENVELOPE_ORACLE})"
_AS_OF = "2024-01-15 00:00:00"


def visible_as_of(env: DataFrame, as_of: str) -> DataFrame:
    """Delayed-delivery visibility: a message is deliverable once
    deliver_at ≤ as_of (deliver_at null ⇒ immediately visible)."""
    ts = F.lit(as_of).cast("timestamp")
    return env.filter((F.col("publish_time") <= ts) & (F.coalesce(F.col("deliver_at"), F.col("publish_time")) <= ts))


@query(
    "delayed_delivery_due",
    section="2.F1",
    doc="Batch oracle of the delayed-delivery tracker (InMemoryDelayedDeliveryTracker"
    ".java:117 getScheduledMessages): messages visible at an as-of instant — "
    "published, and deliver_at (if any) has elapsed.",
    oracle=f"""
        {_ENV}
        SELECT partition, COUNT(*) AS n_visible, MAX(sequence_id) AS max_seq
        FROM envelope
        WHERE publish_time <= TIMESTAMP '{_AS_OF}'
          AND COALESCE(deliver_at, publish_time) <= TIMESTAMP '{_AS_OF}'
        GROUP BY partition
    """,
)
def delayed_delivery_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    return (
        visible_as_of(env, _AS_OF)
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n_visible"), F.max("sequence_id").alias("max_seq"))
    )


@query(
    "ttl_expiry",
    section="2.F3",
    doc="TTL expiry (PersistentMessageExpiryMonitor.java:77): drop messages older "
    "than ttl relative to the log's max publish_time; count survivors per partition.",
    oracle=f"""
        {_ENV}
        SELECT partition, COUNT(*) AS n_live
        FROM envelope
        WHERE publish_time >= (SELECT MAX(publish_time) FROM envelope) - INTERVAL 7 DAY
        GROUP BY partition
    """,
)
def ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    horizon = env.agg((F.max("publish_time") - F.expr("INTERVAL 7 DAY")).alias("h"))
    return (
        env.join(F.broadcast(horizon))
        .filter(F.col("publish_time") >= F.col("h"))
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n_live"))
    )


@query(
    "seek_by_timestamp",
    section="2.F5",
    doc="seekAsync(timestamp) (ConsumerImpl.java:2203 / PersistentMessageFinder.java:57): "
    "first offset per partition with publish_time ≥ ts, plus message count from there. "
    "Parquet min/max stats make this the same binary search the broker does.",
    oracle=f"""
        {_ENV}
        SELECT partition, MIN("offset") AS seek_offset, COUNT(*) AS n_from_seek
        FROM envelope
        WHERE publish_time >= TIMESTAMP '{_AS_OF}'
        GROUP BY partition
    """,
)
def seek_by_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    return (
        env.filter(F.col("publish_time") >= F.lit(_AS_OF).cast("timestamp"))
        .groupBy("partition")
        .agg(F.min("offset").alias("seek_offset"), F.count(F.lit(1)).alias("n_from_seek"))
    )


@query(
    "last_message_id",
    section="2.F7",
    doc="GET_LAST_MESSAGE_ID (ServerCnx.java:2147): max offset + its sequence per partition "
    "— the bounded-read horizon Trigger.AvailableNow uses.",
    oracle=f"""
        {_ENV}
        SELECT partition, MAX("offset") AS last_offset,
               ARG_MAX(sequence_id, "offset") AS last_sequence_id
        FROM envelope GROUP BY partition
    """,
)
def last_message_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    return env.groupBy("partition").agg(
        F.max("offset").alias("last_offset"),
        F.max_by("sequence_id", "offset").alias("last_sequence_id"),
    )


@query(
    "seek_reset_cursor",
    section="2.F6",
    doc="Seek / resetCursor to an absolute position (PersistentSubscription.java:694): "
    "re-read everything from (partition, offset) ≥ the reset point.",
    oracle=f"""
        {_ENV}
        SELECT partition, COUNT(*) AS n_replayed, MIN("offset") AS first_offset
        FROM envelope WHERE "offset" >= 100
        GROUP BY partition
    """,
)
def seek_reset_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    return (
        env.filter(F.col("offset") >= 100)
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n_replayed"), F.min("offset").alias("first_offset"))
    )


@query(
    "topic_storage_stats",
    section="2.A-admin",
    doc="Admin topic stats (the `topics stats` surface, "
    "PersistentTopicsBase.internalGetStats / TopicStatsImpl): per partition "
    "— message count, last offset (entries), payload storage bytes, "
    "publisher count, publish-time span. One hash-agg over the envelope "
    "scan; the reference reads the same numbers from managed-ledger "
    "metadata, Spark computes them from the columnar payloads at scan "
    "speed (or from parquet footer stats when only counts are needed).",
    oracle=f"""
        {_ENV}
        SELECT partition,
               COUNT(*) AS msg_count,
               MAX("offset") AS last_offset,
               CAST(SUM(strlen(props)) AS BIGINT) AS storage_bytes,
               COUNT(DISTINCT producer_name) AS n_publishers,
               STRFTIME(MIN(publish_time), '%Y-%m-%d %H:%M:%S.%f') AS first_publish,
               STRFTIME(MAX(publish_time), '%Y-%m-%d %H:%M:%S.%f') AS last_publish
        FROM envelope GROUP BY partition
    """,
)
def topic_storage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    env = cached_envelope(spark, sf_dir)
    return env.groupBy("partition").agg(
        F.count(F.lit(1)).alias("msg_count"),
        F.max("offset").alias("last_offset"),
        F.sum(F.length("value")).alias("storage_bytes"),
        F.countDistinct("producer_name").alias("n_publishers"),
        F.date_format(F.min("publish_time"), fmt).alias("first_publish"),
        F.date_format(F.max("publish_time"), fmt).alias("last_publish"),
    )


RATE_TOKEN_US = 3_600_000_000  # one dispatch permit per hour per partition


@query(
    "dispatch_rate_limit",
    section="2.J-rate",
    doc="Dispatch rate limiting (DispatchRateLimiter, pulsar-broker/.../"
    "persistent/DispatchRateLimiter.java: token-bucket throttle per "
    "partition): each partition dispatches at most one message per permit "
    "interval; arrivals faster than the rate queue and drain in order. The "
    "sequential token-bucket recurrence s_j = max(a_j, s_{j-1} + T) has the "
    "closed form s_j = j*T + cummax(a_i - i*T) — ONE window cummax per "
    "partition instead of an unparallelizable loop, and pure BIGINT "
    "microsecond arithmetic (exact, no float). Reports per-partition "
    "throttle pressure: queued count + worst-case added latency.",
    oracle=f"""
        {_ENV},
        r AS (
            SELECT partition, epoch_us(publish_time) AS a,
                   ROW_NUMBER() OVER (PARTITION BY partition
                                      ORDER BY publish_time, "offset") - 1 AS j
            FROM envelope),
        s AS (
            SELECT partition, a,
                   MAX(a - j * {RATE_TOKEN_US}) OVER (
                       PARTITION BY partition ORDER BY j
                       ROWS UNBOUNDED PRECEDING) + j * {RATE_TOKEN_US} AS start_us
            FROM r)
        SELECT partition,
               COUNT(*) AS n_msgs,
               CAST(SUM(CASE WHEN start_us > a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_throttled,
               CAST(MAX(start_us - a) AS BIGINT) AS max_delay_us
        FROM s GROUP BY partition
    """,
)
def dispatch_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _token_bucket_pressure(
        cached_envelope(spark, sf_dir), "partition", RATE_TOKEN_US
    )


def _token_bucket_pressure(env, key_col: str, token_us: int, byte_token_us: int = 0):
    """Closed-form token-bucket backlog per ``key_col``: the sequential
    recurrence s_j = max(a_j, s_{j-1} + c_{j-1}) (c = per-message permit
    cost) distributes as s_j = cummax_i(a_i − D_i) + D_j with D the
    exclusive prefix sum of costs — one window cummax per key, exact BIGINT
    microseconds. ``byte_token_us`` adds the byte-rate leg: cost =
    max(token_us, bytes * byte_token_us).

    Ordering: ``offset`` is only unique within a topic partition, so when
    ``key_col`` spans partitions (producer_name) and the frame carries a
    ``partition`` column, the sort adds it as a tiebreaker — (publish_time,
    partition, offset) is globally unique and both engines break ties
    identically (oracle OVER clauses match). Frames without a partition
    column (single-log inputs, where offset is already unique) keep the
    two-column order."""
    from pyspark.sql.window import Window as W

    order_cols = (
        ["publish_time", "partition", "offset"]
        if key_col != "partition" and "partition" in env.columns
        else ["publish_time", "offset"]
    )
    jw = W.partitionBy(key_col).orderBy(*order_cols)
    cost = (
        F.greatest(F.lit(token_us), F.length("value").cast("long") * byte_token_us)
        if byte_token_us
        else F.lit(token_us)
    )
    sel_cols = {key_col, *order_cols}
    r = env.select(
        *sorted(sel_cols),
        F.unix_micros("publish_time").alias("a"),
        cost.cast("long").alias("c"),
    ).withColumn(
        "d",
        F.coalesce(
            F.sum("c").over(jw.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ),
    )
    cm = W.partitionBy(key_col).orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, 0
    )
    s = r.withColumn("start_us", F.max(F.col("a") - F.col("d")).over(cm) + F.col("d"))
    return s.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum(F.when(F.col("start_us") > F.col("a"), 1).otherwise(0))
        .cast("long")
        .alias("n_throttled"),
        F.max(F.col("start_us") - F.col("a")).cast("long").alias("max_delay_us"),
    )


PUB_TOKEN_US = 900_000_000      # one publish permit per 15 min per producer
PUB_BYTE_TOKEN_US = 80_000_000  # byte-rate leg: 80s of drain per payload byte


@query(
    "publish_rate_limit",
    section="2.J-rate",
    doc="Publish-side rate limiting (PublishRateLimiterImpl, pulsar-broker/"
    ".../service/PublishRateLimiterImpl.java: producers are throttled on "
    "the publish path by BOTH a message-rate and a byte-rate token bucket; "
    "same AsyncTokenBucket core as dispatch). Modeled per producer over the "
    "envelope log: per-message permit cost = max(msg-token, payload_bytes × "
    "byte-token) — the binding bucket — folded through the same closed-form "
    "recurrence as dispatch_rate_limit (s_j = cummax(a_i − D_i) + D_j with "
    "D the exclusive prefix sum of costs), so the whole throttle decision "
    "is one window cummax per producer, exact BIGINT microseconds, no "
    "sequential loop. Reports per-producer publish backpressure: throttled "
    "count + worst-case added latency.",
    oracle=f"""
        {{_ENV}},
        r AS (
            SELECT producer_name, epoch_us(publish_time) AS a,
                   GREATEST({PUB_TOKEN_US}, strlen(props) * {PUB_BYTE_TOKEN_US}) AS c,
                   publish_time, partition, "offset"
            FROM envelope),
        d AS (
            SELECT producer_name, a, c,
                   COALESCE(SUM(c) OVER (PARTITION BY producer_name
                                         ORDER BY publish_time, partition, "offset"
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS d,
                   publish_time, partition, "offset"
            FROM r),
        s AS (
            SELECT producer_name, a,
                   MAX(a - d) OVER (PARTITION BY producer_name
                                    ORDER BY publish_time, partition, "offset"
                                    ROWS UNBOUNDED PRECEDING) + d AS start_us
            FROM d)
        SELECT producer_name,
               COUNT(*) AS n_msgs,
               CAST(SUM(CASE WHEN start_us > a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_throttled,
               CAST(MAX(start_us - a) AS BIGINT) AS max_delay_us
        FROM s GROUP BY producer_name
    """.replace("{_ENV}", _ENV),
)
def publish_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    return _token_bucket_pressure(
        env, "producer_name", PUB_TOKEN_US, PUB_BYTE_TOKEN_US
    )


SUB_TOKEN_US = 14_400_000_000  # one subscribe permit per 4 h per partition


@query(
    "subscribe_rate_limit",
    section="2.J-rate",
    doc="Subscription-creation rate limiting (SubscribeRateLimiter, "
    "pulsar-broker/.../service/persistent/SubscribeRateLimiter.java: "
    "subscribe calls per consumer are token-bucket throttled so a "
    "reconnect storm cannot hammer the broker). Subscribe log modeled "
    "deterministically from the envelope: each consumer's FIRST message "
    "per day = one (re)subscribe attempt on its partition dispatcher; "
    "attempts then fold through the SAME closed-form token bucket as "
    "dispatch/publish (shared _token_bucket_pressure — cummax of "
    "arrival − exclusive-prefix-cost per partition). Completes the QoS "
    "family: dispatch (per partition), publish (per producer, msg+byte), "
    "subscribe (per partition, attempt-rate).",
    oracle=f"""
        {{_ENV}},
        attempts AS (
            SELECT partition,
                   MIN(publish_time) AS publish_time,
                   MIN("offset") AS "offset"
            FROM envelope
            GROUP BY partition, key, date_trunc('day', publish_time)),
        r AS (
            SELECT partition, epoch_us(publish_time) AS a, publish_time, "offset",
                   ROW_NUMBER() OVER (PARTITION BY partition
                                      ORDER BY publish_time, "offset") - 1 AS j
            FROM attempts),
        s AS (
            SELECT partition, a,
                   MAX(a - j * {SUB_TOKEN_US}) OVER (
                       PARTITION BY partition ORDER BY publish_time, "offset"
                       ROWS UNBOUNDED PRECEDING) + j * {SUB_TOKEN_US} AS start_us
            FROM r)
        SELECT partition,
               COUNT(*) AS n_msgs,
               CAST(SUM(CASE WHEN start_us > a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_throttled,
               CAST(MAX(start_us - a) AS BIGINT) AS max_delay_us
        FROM s GROUP BY partition
    """.replace("{_ENV}", _ENV),
)
def subscribe_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    attempts = env.groupBy(
        "partition", "key", F.date_trunc("day", "publish_time").alias("__day")
    ).agg(
        F.min("publish_time").alias("publish_time"), F.min("offset").alias("offset")
    ).drop("key", "__day")
    return _token_bucket_pressure(attempts, "partition", SUB_TOKEN_US)




DECAY_HALF_LIFE_DAYS = 7  # one half-life per week


@query(
    "decayed_engagement_scores",
    section="2.N-behavior",
    doc="Exponential time-decay engagement scoring (the recsys/feature-"
    "store freshness weighting): each event contributes value x "
    f"2^(-age_weeks) with a {DECAY_HALF_LIFE_DAYS}-day half-life, ages "
    "measured in whole days from the corpus max timestamp (one broadcast "
    "stats row). The decay weights are EXACT DYADIC RATIONALS "
    "(1 / (1 << age_weeks) — shifted-integer reciprocals, no libm pow), "
    "so the weighted sums agree across engines to the last rounded "
    "digit. Per-user top-10 by score with deterministic tiebreak; one "
    "scan + one user hash-agg + a TakeOrdered.",
    oracle=f"""
        WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
        aged AS (
            SELECT user_id,
                   CAST(ROUND(value * 10000) AS BIGINT) AS vq,
                   LEAST(((mx.m - epoch_us(ts)) // 86400000000)
                         // {DECAY_HALF_LIFE_DAYS}, 20) AS hw
            FROM events, mx
        ),
        scored AS (
            SELECT user_id,
                   SUM(vq * (CAST(1 AS BIGINT) << CAST(20 - hw AS INT)))
                       AS score_num,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM aged GROUP BY user_id
        )
        SELECT user_id,
               ROUND(score_num / (1048576.0 * 10000.0), 4) AS score,
               n_events
        FROM scored
        ORDER BY score_num DESC, user_id ASC
        LIMIT 10
    """,
)
def decayed_engagement_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_3_2_codedump_spark.catalog import load as _load

    events = _load(spark, sf_dir, "events")
    mx = events.agg(F.max(F.unix_micros("ts")).alias("m"))
    # fully integer accumulation: value quantized to 1e-4, every term scaled
    # to the common 2^20 denominator (ages clamp at 20 half-lives, < 1e-6 of
    # the weight) — both engines sum identical BIGINTs, so the 4dp rounding
    # of the exact rational can never flap at a half-ulp boundary
    aged = events.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr("CAST(ROUND(value * 10000) AS BIGINT)").alias("vq"),
        F.least(
            F.expr(
                f"((m - unix_micros(ts)) DIV 86400000000) DIV {DECAY_HALF_LIFE_DAYS}"
            ),
            F.lit(20),
        ).alias("hw"),
    )
    return (
        aged.groupBy("user_id")
        .agg(
            F.sum(
                F.col("vq")
                * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - hw AS INT))")
            ).alias("score_num"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(F.desc("score_num"), F.asc("user_id"))
        .limit(10)
        .select(
            "user_id",
            F.round(F.col("score_num") / (1048576.0 * 10000.0), 4).alias("score"),
            "n_events",
        )
    )


@query(
    "peak_concurrency_sweep",
    section="2.N-behavior",
    doc="Peak-concurrency via the classic SWEEP-LINE: each event opens a "
    "service interval [ts, ts + floor(value) seconds) (the deliver_at "
    "arithmetic of the envelope applied to every type), intervals become "
    "+1/-1 boundary points, and the running sum over the time-ordered "
    "sweep — ends sort before starts at the same instant, so touching "
    "intervals never double-count — yields the concurrency profile; the "
    "max and the first instant it is reached are emitted per event_type. "
    "The sweep window is PARTITIONED BY event_type with a fully unique "
    "(t, delta, event_id) ordering — per-key state, exact integers, no "
    "global window.",
    oracle="""
        WITH iv AS (
            SELECT event_type, event_id, epoch_us(ts) AS s_us,
                   epoch_us(ts) + CAST(FLOOR(value) AS BIGINT) * 1000000 AS e_us
            FROM events
        ),
        pts AS (
            SELECT event_type, event_id, s_us AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT event_type, event_id, e_us AS t, -1 AS delta FROM iv
        ),
        sweep AS (
            SELECT event_type, t,
                   SUM(delta) OVER (PARTITION BY event_type
                                    ORDER BY t, delta, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS running
            FROM pts
        ),
        mx AS (
            SELECT event_type, MAX(running) AS peak
            FROM sweep GROUP BY event_type
        )
        SELECT s.event_type,
               CAST(m.peak AS BIGINT) AS peak_concurrency,
               CAST(MIN(s.t) AS BIGINT) AS first_peak_us
        FROM sweep s JOIN mx m
          ON m.event_type = s.event_type AND s.running = m.peak
        GROUP BY s.event_type, m.peak
    """,
)
def peak_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    iv = events.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + F.floor("value").cast("long") * F.lit(1_000_000)
        ).alias("e_us"),
    )
    pts = iv.select(
        "event_type", "event_id", F.col("s_us").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            "event_type", "event_id", F.col("e_us").alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the swept running-sum frame feeds the peak agg AND the first-instant
    # filter — persist once so the boundary-point window runs once and the
    # union's two parquet legs aren't re-read per consumer (r13 scan
    # audit: 4 events scans -> the union's 2, then cache)
    from pulsar_3_2_codedump_spark.catalog import persist_shared_corpus_frame

    sweep = persist_shared_corpus_frame(
        pts.select("event_type", "t", F.sum("delta").over(w).alias("running"))
    )
    mx = sweep.groupBy("event_type").agg(F.max("running").alias("peak"))
    return (
        sweep.join(F.broadcast(mx), "event_type")
        .filter(F.col("running") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").cast("long").alias("first_peak_us"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("peak_concurrency"),
            "first_peak_us",
        )
    )


@query(
    "missing_hours_audit",
    section="2.N-quality",
    doc="Ingestion-completeness audit against a generated CALENDAR SPINE "
    "(the data-quality check every scheduled pipeline runs before "
    "publishing a partition): the expected hour range is the corpus-wide "
    "[min, max] hour, the spine is sequence()-generated — metadata-"
    "scale, never a scan — cross-joined with the event-type dimension "
    "and anti-joined against the hours actually present; per type the "
    "expected/present/missing counts and the first missing hour are "
    "emitted. The fact scan aggregates once to (type, hour) partials; "
    "everything after is calendar-bounded.",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM events
        ),
        spine AS (
            SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ),
        expected AS (
            SELECT t.event_type, s.h
            FROM (SELECT DISTINCT event_type FROM events) t, spine s
        ),
        present AS (
            SELECT DISTINCT event_type, date_trunc('hour', ts) AS h
            FROM events
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_expected,
               CAST(SUM(CASE WHEN p.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_present,
               CAST(SUM(CASE WHEN p.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing,
               COALESCE(STRFTIME(MIN(CASE WHEN p.h IS NULL THEN e.h END),
                                 '%Y-%m-%d %H:%M:%S'), 'none')
                   AS first_missing_hour
        FROM expected e
        LEFT JOIN present p
          ON p.event_type = e.event_type AND p.h = e.h
        GROUP BY e.event_type
    """,
)
def missing_hours_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    types = events.select("event_type").distinct()
    expected = types.crossJoin(F.broadcast(spine))
    present = (
        events.select(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    miss = F.when(F.col("hit").isNull(), 1).otherwise(0)
    return (
        expected.join(present, ["event_type", "h"], "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_expected"),
            F.sum(F.col("hit").isNotNull().cast("int")).cast("long").alias(
                "n_present"
            ),
            F.sum(miss).cast("long").alias("n_missing"),
            F.coalesce(
                F.date_format(
                    F.min(F.when(F.col("hit").isNull(), F.col("h"))),
                    "yyyy-MM-dd HH:mm:ss",
                ),
                F.lit("none"),
            ).alias("first_missing_hour"),
        )
    )


@query(
    "watermark_partition_lag",
    section="2.G5",
    doc="Per-partition watermark-lag monitor (the readout a streaming "
    "operator watches to spot a straggling partition holding the global "
    "watermark back — Spark's watermark is min over partitions of max "
    "event time): per topic partition, the local max event time, its "
    "lag behind the globally most-advanced partition, the row count, "
    "and whether THIS partition is the straggler defining the "
    "min-watermark. One partial-agg scan to an 8-row frame + one "
    "broadcast of the global extremes — metadata-scale after the scan.",
    oracle=f"""
        {_ENV},
        per AS (
            SELECT partition,
                   MAX(epoch_us(event_time)) AS max_et_us,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM envelope
            GROUP BY partition
        ),
        g AS (SELECT MAX(max_et_us) AS g_max, MIN(max_et_us) AS g_min FROM per)
        SELECT per.partition,
               CAST(per.max_et_us AS BIGINT) AS max_event_us,
               CAST((g.g_max - per.max_et_us) // 1000 AS BIGINT) AS lag_ms,
               per.n_rows,
               per.max_et_us = g.g_min AS is_watermark_holder
        FROM per, g
    """,
)
def watermark_partition_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = cached_envelope(spark, sf_dir)
    per = env.groupBy("partition").agg(
        F.max(F.unix_micros("event_time")).alias("max_et_us"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    g = per.agg(
        F.max("max_et_us").alias("g_max"), F.min("max_et_us").alias("g_min")
    )
    return per.crossJoin(F.broadcast(g)).select(
        "partition",
        F.col("max_et_us").cast("long").alias("max_event_us"),
        F.expr("(g_max - max_et_us) div 1000").cast("long").alias("lag_ms"),
        "n_rows",
        (F.col("max_et_us") == F.col("g_min")).alias("is_watermark_holder"),
    )
