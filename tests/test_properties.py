"""Property-based tests (hypothesis) for the algebraic invariants the engine
relies on at scale: compaction idempotence, dedup stability, salted-agg
equivalence, minhash determinism. Each property runs a real Spark job per
example, so example counts are kept small and inputs tiny."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # key
        st.integers(min_value=0, max_value=999),    # seq (may collide)
        st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
)


def _env_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"])
    pdf = pdf.drop_duplicates(subset=["k", "seq"])  # (key, seq) is an identity
    df = spark.createDataFrame(pdf)
    return df.select(
        F.col("k").cast("string").alias("key"),
        F.col("seq").cast("long").alias("sequence_id"),
        F.col("v").cast("double").alias("value"),
        (F.col("k") % 2).cast("int").alias("partition"),
        F.col("seq").cast("long").alias("offset"),
    )


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=ROWS)
def test_compaction_is_idempotent_and_one_row_per_key(spark, rows):
    from pulsar_3_2_codedump_spark.operators.compaction import latest_per_key

    df = _env_df(spark, rows)
    once = latest_per_key(df)
    twice = latest_per_key(once)
    assert once.count() == df.select("key").distinct().count()
    assert once.exceptAll(twice).count() == 0 and twice.exceptAll(once).count() == 0


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=ROWS)
def test_dedup_replay_is_noop(spark, rows):
    # one producer ⇒ sequence_id is unique across ALL its messages
    # (MessageDeduplication's invariant), so dedupe the generator on seq alone
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"]).drop_duplicates(subset=["seq"])
    df = spark.createDataFrame(pdf).select(
        F.col("k").cast("string").alias("key"),
        F.col("seq").cast("long").alias("sequence_id"),
        F.col("v").cast("double").alias("value"),
    ).withColumn("producer_name", F.lit("p"))
    replayed = df.unionByName(df.limit(10))
    deduped = replayed.dropDuplicates(["producer_name", "sequence_id"])
    assert deduped.count() == df.count()


@settings(max_examples=8, deadline=None, derandomize=True)
@given(rows=ROWS)
def test_salted_agg_equals_plain_agg(spark, rows):
    from pulsar_3_2_codedump_spark.operators.skew import salted_count_sum

    df = _env_df(spark, rows)
    salted = salted_count_sum(df, "key", "value", unique_col="sequence_id", salt=4)
    plain = df.groupBy("key").agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    s = {(r["key"], r["n"], round(r["total"], 6)) for r in salted.collect()}
    p = {(r["key"], r["n"], round(r["total"], 6)) for r in plain.collect()}
    assert s == p


@settings(max_examples=6, deadline=None, derandomize=True)
@given(texts=st.lists(st.text(alphabet="abcdefg ", min_size=10, max_size=40), min_size=2, max_size=10))
def test_minhash_signature_deterministic_and_permutation_invariant(spark, texts):
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        base_hashes,
        minhash_signature,
        shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sig = df.select(
        "doc_id",
        shingles(F.col("text")).alias("sh"),
    ).withColumn("hs", base_hashes(F.col("sh")))
    out = sig.select("doc_id", *minhash_signature(F.col("hs")))
    a = {r["doc_id"]: tuple(r[f"h{j}"] for j in range(8)) for r in out.collect()}
    b = {r["doc_id"]: tuple(r[f"h{j}"] for j in range(8)) for r in out.collect()}
    assert a == b  # deterministic across executions
    # identical text ⇒ identical signature regardless of doc id
    for i, ti in enumerate(texts):
        for j, tj in enumerate(texts):
            if ti == tj:
                assert a[i] == a[j]


@given(
    segs=st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=8),
        min_size=1,
        max_size=5,
    ),
    target=st.integers(min_value=-100, max_value=11_000),
    indexed=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_seek_by_timestamp_matches_bruteforce(tmp_path_factory, segs, target, indexed):
    """The index-pruned seek (manifest min_pt/max_pt + vectorized boundary
    search) returns exactly what a full scan would: the first offset, in
    offset order, whose publish_time >= target — with or without the index
    (legacy segments lack bounds)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pulsar_3_2_codedump_spark.sources.pulsarlike import _seek_offset_for_timestamp

    base = 1_700_000_000_000_000  # anchor epoch micros
    root = str(tmp_path_factory.mktemp("seekprop"))
    os.makedirs(os.path.join(root, "partition=0"), exist_ok=True)
    manifest_segs = []
    flat = []  # (offset, pt_us) in offset order
    start = 0
    for i, pts in enumerate(segs):
        pts_us = [base + p for p in sorted(pts)]
        offs = list(range(start, start + len(pts_us)))
        flat += list(zip(offs, pts_us))
        name = f"seg-{start:020d}-{len(pts_us)}"
        pq.write_table(
            pa.table(
                {
                    "publish_time": pa.array(pts_us, type=pa.timestamp("us")),
                    "offset": pa.array(offs, type=pa.int64()),
                }
            ),
            os.path.join(root, "partition=0", name),
        )
        entry = {"start": start, "count": len(pts_us), "path": name}
        if indexed:
            entry["min_pt"], entry["max_pt"] = min(pts_us), max(pts_us)
        manifest_segs.append(entry)
        start += len(pts_us)

    t_us = base + target
    # brute force: first segment (offset order) holding any qualifying row,
    # then the min qualifying offset within it
    expect = start  # end offset when nothing qualifies
    for seg in manifest_segs:
        qual = [o for o, p in flat[seg["start"] : seg["start"] + seg["count"]] if p >= t_us]
        if qual:
            expect = min(qual)
            break
    assert _seek_offset_for_timestamp(root, "0", manifest_segs, t_us) == expect


# random tiny corpora: 3-8 docs of 3-12 tokens from an 8-word vocabulary —
# small vocab forces heavy shingle sharing, the adversarial case for the
# prefix filter's losslessness claim
_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
CORPUS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=12).map(" ".join),
    min_size=3,
    max_size=8,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(texts=CORPUS, t=st.sampled_from([0.2, 0.5, 0.8]))
def test_prefix_jaccard_join_is_lossless(spark, texts, t):
    from pulsar_3_2_codedump_spark.functions.dedup_ml import shingles
    from pulsar_3_2_codedump_spark.functions.retrieval import prefix_jaccard_join

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    sh = df.select("doc_id", shingles(F.col("text")).alias("sh"))
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_join(sh, t).collect()
    }
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in x.join(y, F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .collect()
    }
    assert got == brute


@settings(max_examples=6, deadline=None, derandomize=True)
@given(texts=CORPUS)
def test_bm25_matches_rowwise_reference_on_random_corpora(spark, texts):
    import math

    from pulsar_3_2_codedump_spark.functions.retrieval import bm25

    terms = ["aa", "bb"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25(df, terms, len(texts)).collect()}
    toks = {i: s.split() for i, s in enumerate(texts)}
    n = len(texts)
    avgdl = sum(len(w) for w in toks.values()) / n
    for d, ws in toks.items():
        s = 0.0
        for trm in terms:
            tf = ws.count(trm)
            dfq = sum(1 for w in toks.values() if trm in w)
            idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
        assert abs(got[d] - round(s, 4)) < 1e-9


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    payloads=st.lists(
        st.text(min_size=0, max_size=300), min_size=1, max_size=8, unique=True
    ),
    max_bytes=st.sampled_from([1, 7, 64, 200, 500]),
)
def test_chunk_roundtrip_is_identity(spark, payloads, max_bytes):
    # chunk -> reassemble must be the identity for ANY payload (unicode,
    # empty strings, payloads shorter/longer than the frame limit) at any
    # frame size — the B4 round-trip contract
    from pulsar_3_2_codedump_spark.envelope import chunk_payloads, reassemble_chunks

    df = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(payloads)], "uuid string, payload string"
    )
    chunks = chunk_payloads(df, max_bytes=max_bytes)
    got = {r["uuid"]: r["payload"] for r in reassemble_chunks(chunks).collect()}
    want = {str(i): p for i, p in enumerate(payloads)}
    assert got == want


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    fails=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
)
def test_nack_ladder_closed_form_matches_sequential_backoff(spark, fails):
    # nack_redelivery_ladder's closed form 10s*(2^nacks - 1) must equal the
    # sequential MultiplierRedeliveryBackoff walk: sum of next(k) for
    # k = 0..nacks-1 with next(k) = min(minDelay*2^k, maxDelay) — on the
    # query's domain (nacks capped at MAX_REDELIVER=3 < the maxDelay knee)
    from pulsar_3_2_codedump_spark.operators.delivery import (
        MAX_REDELIVER,
        NACK_MIN_DELAY_MS,
    )

    MAX_DELAY_MS = 600_000  # MultiplierRedeliveryBackoff default maxDelayMs
    for f in fails:
        nacks = min(f, MAX_REDELIVER)
        sequential = sum(
            min(NACK_MIN_DELAY_MS * 2**k, MAX_DELAY_MS) for k in range(nacks)
        )
        closed = NACK_MIN_DELAY_MS * (2**nacks - 1)
        assert closed == sequential


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),   # order key (ties ok)
            st.integers(min_value=0, max_value=99),    # value to prefix-sum
        ),
        min_size=2,
        max_size=50,
    )
)
def test_exclusive_prefix_matches_sequential_on_random_partials(spark, vals):
    # prefixops.exclusive_prefix (triangular broadcast join) must equal the
    # sequential exclusive running sum over bucket order for ANY partials
    # frame, including duplicate bucket ids collapsing first
    import pandas as pd

    from pulsar_3_2_codedump_spark.operators.prefixops import exclusive_prefix

    pdf = (
        pd.DataFrame(vals, columns=["b", "v"])
        .groupby("b", as_index=False)["v"]
        .sum()
        .sort_values("b")
    )
    df = spark.createDataFrame(pdf).select(
        F.col("b").cast("long").alias("bucket"), F.col("v").cast("long").alias("val")
    )
    got = {
        r["bucket"]: r["carry"]
        for r in exclusive_prefix(df, "bucket", "val", "sum", "carry").collect()
    }
    run = 0
    for _, row in pdf.iterrows():
        # exclusive prefix of the FIRST bucket is NULL (no predecessor)
        if row["b"] == pdf["b"].iloc[0]:
            assert got[row["b"]] is None
        else:
            assert got[row["b"]] == run
        run += row["v"]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 10) - 1),
            st.integers(min_value=0, max_value=(1 << 10) - 1),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=50, deadline=None)
def test_morton_interleave_is_bijective_and_decodable(pairs):
    # the layout.py Z-index arithmetic: interleaving must be injective over
    # the 10-bit x 10-bit domain and decode back to the inputs
    def interleave(r1, r2):
        z = 0
        for i in range(10):
            z += ((r1 >> i) & 1) * (4 ** i) + ((r2 >> i) & 1) * (2 * 4 ** i)
        return z

    def deinterleave(z):
        r1 = r2 = 0
        for i in range(10):
            r1 |= ((z >> (2 * i)) & 1) << i
            r2 |= ((z >> (2 * i + 1)) & 1) << i
        return r1, r2

    zs = {}
    for r1, r2 in pairs:
        z = interleave(r1, r2)
        assert 0 <= z < (1 << 20)
        assert deinterleave(z) == (r1, r2)
        if z in zs:
            assert zs[z] == (r1, r2)
        zs[z] = (r1, r2)


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=100),
    st.integers(min_value=0, max_value=500_000),
)
@settings(max_examples=100, deadline=None)
def test_cusum_closed_form_equals_recurrence(xs, k):
    # behavior.py cusum_changepoint's device: the Page recurrence
    # s_j = max(0, s_{j-1} + x_j - k) equals P_j - min(0, min_{i<=j} P_i)
    # for P = prefix sums of (x - k) — for ANY series and allowance
    SCALE = 1000
    s = 0
    p = 0
    minp = 0
    for x in xs:
        s = max(0, s + x * SCALE - k)
        p += x * SCALE - k
        minp = min(minp, p)
        assert s == p - min(minp, 0) == p - minp


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20000),   # weight w
            st.integers(min_value=1, max_value=1 << 52), # hash draw u_int
        ),
        min_size=2,
        max_size=50,
    )
)
@settings(max_examples=50, deadline=None)
def test_priority_sampling_fixed_point_ranks_agree_with_exact(pairs):
    # sampling.py priority_sample_topk: (w * 2^40) DIV u is a quantized
    # w/u — whenever two quantized priorities DIFFER, the exact rational
    # ordering w1/u1 vs w2/u2 must agree (cross-multiplied, no floats)
    SCALE = 1 << 40
    pri = [(w * SCALE) // u for w, u in pairs]
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            if pri[i] != pri[j]:
                w1, u1 = pairs[i]
                w2, u2 = pairs[j]
                assert (pri[i] > pri[j]) == (w1 * u2 > w2 * u1)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    pool=st.lists(
        st.text(alphabet="abcd", min_size=2, max_size=8), min_size=2, max_size=12
    )
)
def test_passjoin_keying_is_complete_on_random_pools(spark, pool):
    # pure-Python mirror of passjoin_edit_pairs' key construction: for ANY
    # string pool, the (segment#, length, text) equi-keys must cover every
    # pair within edit distance 1 (completeness — soundness comes from the
    # levenshtein verify step)
    import itertools

    def lev1(s, t):
        if s == t:
            return True
        if abs(len(s) - len(t)) > 1:
            return False
        # one-edit check
        if len(s) == len(t):
            return sum(a != b for a, b in zip(s, t)) == 1
        a, b = (s, t) if len(s) < len(t) else (t, s)
        for i in range(len(b)):
            if b[:i] + b[i + 1 :] == a:
                return True
        return False

    def probe_keys(s):
        l1 = len(s) // 2
        return {(1, len(s), s[:l1]), (2, len(s), s[l1:])}

    def index_keys(t):
        keys = set()
        for ls in (len(t) - 1, len(t), len(t) + 1):
            if ls < 2:
                continue
            l1, l2 = ls // 2, ls - ls // 2
            keys.add((1, ls, t[:l1]))
            keys.add((2, ls, t[len(t) - l2 :] if l2 <= len(t) else t))
        return keys

    names = sorted(set(pool))
    for s, t in itertools.combinations(names, 2):
        if lev1(s, t) and len(s) >= 2 and len(t) >= 2:
            assert (probe_keys(s) & index_keys(t)) or (
                probe_keys(t) & index_keys(s)
            ), (s, t)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(n=st.integers(min_value=1, max_value=60))
def test_ushape_bps_schedule_conserves_and_is_u_shaped(spark, n):
    # the integer basis-point schedule attribution_position_based applies
    def bps(rn, n):
        if n == 1:
            return 10000
        if n == 2:
            return 5000
        if rn == 1 or rn == n:
            return 4000
        base, rem = divmod(2000, n - 2)
        return base + (1 if rn - 1 <= rem else 0)

    sched = [bps(i, n) for i in range(1, n + 1)]
    assert sum(sched) == 10000
    if n >= 3:
        assert sched[0] == sched[-1] == 4000
        mids = sched[1:-1]
        assert max(mids) - min(mids) <= 1          # remainder spread is even
        assert mids == sorted(mids, reverse=True)  # earliest get the remainder


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=40),
    target=st.integers(min_value=1, max_value=4000),
)
def test_compaction_binning_is_contiguous_and_conserving(spark, sizes, target):
    # segment_compaction_plan's closed form: bin = exclusive-prefix DIV target
    cum = 0
    bins, starts = [], []
    for b in sizes:
        bins.append(cum // target)
        starts.append(cum)
        cum += b
    assert bins == sorted(bins)                      # monotone (contiguous runs)
    assert bins[0] == 0
    per = {}
    for b, s in zip(bins, sizes):
        per[b] = per.get(b, 0) + s
    assert sum(per.values()) == sum(sizes)           # conservation
    for i in range(1, len(sizes)):
        if bins[i] > bins[i - 1]:
            # a new bin starts ONLY because the running total crossed its
            # target boundary (bin ids may legitimately skip when one
            # segment alone spans multiple targets)
            assert starts[i] >= (bins[i - 1] + 1) * target
            assert bins[i] - bins[i - 1] <= -(-sizes[i - 1] // target) + 1


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    users_a=st.sets(st.integers(min_value=0, max_value=10_000), max_size=40),
    users_b=st.sets(st.integers(min_value=0, max_value=10_000), max_size=40),
)
def test_hll_register_merge_equals_union_registers(spark, users_a, users_b):
    # the mathematical core of hll_union_windows / streaming_hll_distinct:
    # register-wise MAX of two partitions' registers == registers of the union
    import hashlib

    def regs(users):
        out = {}
        for u in users:
            hv = int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16)
            bucket, w = hv % 256, hv // 256
            rho = 45 if w == 0 else 45 - w.bit_length()
            out[bucket] = max(out.get(bucket, 0), rho)
        return out

    ra, rb, ru = regs(users_a), regs(users_b), regs(users_a | users_b)
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == ru


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=500_000),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_cusum_carry_fold_is_associative_at_any_split(xs, k, data):
    # queries_streaming._cusum_fold's device: the carry
    # (P, M = min(0, prefix mins), peak, n, last_x) absorbs bucket suffixes
    # associatively — folding the series in ANY number of pieces equals the
    # one-shot fold, which is what lets a streaming generation continue from
    # the previous generation's carry without re-reading it.
    SCALE = 1000

    def fold(carry, chunk):
        p, m, peak, n, last_x = carry
        for x in chunk:
            p += x * SCALE - k
            m = min(m, p)
            peak = max(peak, p - m)
            n += 1
            last_x = x
        return (p, m, peak, n, last_x)

    one_shot = fold((0, 0, 0, 0, None), xs)
    n_cuts = data.draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(xs)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    carry = (0, 0, 0, 0, None)
    prev = 0
    for c in cuts + [len(xs)]:
        carry = fold(carry, xs[prev:c])
        prev = c
    assert carry == one_shot
    # and the emitted statistics agree with the Page recurrence
    s = 0
    peak_ref = 0
    for x in xs:
        s = max(0, s + x * SCALE - k)
        peak_ref = max(peak_ref, s)
    p, m, peak, n, last_x = one_shot
    assert p - m == s and peak == peak_ref and n == len(xs) and last_x == xs[-1]
