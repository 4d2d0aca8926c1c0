"""BPE merge-step, hashing-trick features, event-sequence bigrams (§2.N)."""

import datetime as dt

from pyspark.sql import functions as F

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.functions.tokenize_ml import (
    HASH_DIMS,
    bpe_merge_step,
    hashing_trick_features,
)
from pulsar_3_2_codedump_spark.operators.behavior import event_bigram_counts
from tests.conftest import SF_DIR


def test_bpe_pairs_count_occurrences_not_distinct(spark):
    # "a b a b a" has pairs: (a b) x2, (b a) x2 — multiplicity matters,
    # unlike the distinct shingles used for dedup.
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c")], "doc_id long, text string"
    )
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = {
        r["pair"]: r["cnt"]
        for r in df.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == {"a b": 3, "b a": 2, "b c": 1}


def test_bpe_merge_step_fixture_invariants(spark):
    rows = bpe_merge_step(spark, SF_DIR).collect()
    assert len(rows) == 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)  # ordered by count desc
    assert all(len(r["pair"].split(" ")) == 2 for r in rows)


def test_hashing_trick_preserves_token_mass(spark):
    out = hashing_trick_features(spark, SF_DIR)
    agg = out.agg(F.sum("cnt").alias("s"), F.max("dim").alias("mx"), F.min("dim").alias("mn")).collect()[0]
    docs = load(spark, SF_DIR, "documents").filter(F.col("doc_id") < 300)
    total_toks = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))).alias("t")
    ).collect()[0]["t"]
    assert agg["s"] == total_toks  # hashing never drops or double-counts a token
    assert 0 <= agg["mn"] and agg["mx"] < HASH_DIMS


def test_event_bigram_total_is_events_minus_users(spark):
    out = event_bigram_counts(spark, SF_DIR)
    total = out.agg(F.sum("cnt").alias("s")).collect()[0]["s"]
    ev = load(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user's timeline of k events yields exactly k-1 transitions
    assert total == n_events - n_users


def test_quality_classifier_margin_matches_manual(spark):
    # two tiny docs; recompute the hashed-weight margin in pure python
    import hashlib

    from pulsar_3_2_codedump_spark.functions.tokenize_ml import (
        CLF_BIAS,
        CLF_DIMS,
        quality_classifier_score,
    )

    def md5int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def weight(tok: str) -> float:
        dim = md5int(tok) % CLF_DIMS
        return (md5int(f"qw:{dim}") % 2001 - 1000) / 1000.0

    docs = spark.createDataFrame(
        [(1, "good clean prose here", "en", "s", 20),
         (2, "spam spam spam", "en", "s", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in quality_classifier_score(spark, d).collect()}
    for doc_id, text in [(1, "good clean prose here"), (2, "spam spam spam")]:
        toks = text.split()
        margin = CLF_BIAS + sum(weight(t) for t in toks) / len(toks)
        assert abs(out[doc_id]["margin"] - round(margin, 6)) < 1e-9
        assert out[doc_id]["keep"] == (margin >= 0.0)


def test_duplicated_ngram_coverage_positions(spark):
    # doc 1 and 2 share the 4-gram "a b c d" (positions 1-4 in both);
    # doc 3 shares nothing. Coverage counts positions, not distinct grams.
    import tempfile

    from pulsar_3_2_codedump_spark.functions.dedup_ml import duplicated_ngram_coverage

    docs = spark.createDataFrame(
        [(1, "a b c d x y z w", "en", "s", 10),
         (2, "q a b c d r s t", "en", "s", 10),
         (3, "unique tokens only right here now ok fine", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in duplicated_ngram_coverage(spark, d).collect()}
    # doc1: "a b c d" at pos 1 covers 1..4 -> 4 of 8 tokens
    assert out[1]["dup_tokens"] == 4 and out[1]["dup_fraction"] == 0.5
    # doc2: "a b c d" at pos 2 covers 2..5 -> 4 of 8
    assert out[2]["dup_tokens"] == 4
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_fraction"] == 0.0


def test_bpe_train_merges_matches_sequential_reference(spark):
    # the declarative 3-iteration trainer must equal a plain-Python BPE
    # (Sennrich et al.) run on the same vocabulary: count weighted adjacent
    # pairs, argmax with (count desc, pair asc) tiebreak, merge
    # leftmost-first non-overlapping, repeat
    import re
    from collections import Counter

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.tokenize_ml import (
        BPE_TRAIN_MERGES,
        bpe_train_merges,
    )
    from tests.conftest import SF_DIR

    got = {r["merge_rank"]: r for r in bpe_train_merges(spark, SF_DIR).collect()}
    assert len(got) == BPE_TRAIN_MERGES

    texts = [
        r["text"]
        for r in load(spark, SF_DIR, "documents").filter("lang = 'en'").collect()
    ]
    vocab = Counter(
        w for t in texts for w in t.lower().strip().split() if re.fullmatch("[a-z]+", w)
    )
    words = {w: list(w) for w in vocab}
    for k in range(1, BPE_TRAIN_MERGES + 1):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (got[k]["left_sym"], got[k]["right_sym"]) == (a, b), k
        assert got[k]["pair_count"] == cnt, k
        for w, syms in words.items():  # leftmost-first non-overlapping merge
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

def test_bpe_apply_encode_matches_sequential_reference(spark):
    # encode must equal a plain-Python BPE trained the same way then applied
    # per word: n_subwords(doc) = sum over its [a-z]+ words of the merged
    # symbol count; fertility = n_subwords / n_words
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.tokenize_ml import (
        BPE_TRAIN_MERGES,
        bpe_apply_encode,
    )
    from tests.conftest import SF_DIR

    rows = load(spark, SF_DIR, "documents").filter("lang = 'en'").collect()
    doc_words = {
        r["doc_id"]: [
            w
            for w in r["text"].lower().strip().split()
            if re.fullmatch("[a-z]+", w)
        ]
        for r in rows
    }
    vocab = Counter(w for ws in doc_words.values() for w in ws)
    words = {w: list(w) for w in vocab}
    for _ in range(BPE_TRAIN_MERGES):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        (a, b), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    got = {r["doc_id"]: r for r in bpe_apply_encode(spark, SF_DIR).collect()}
    expected = {
        d: (len(ws), sum(len(words[w]) for w in ws))
        for d, ws in doc_words.items()
        if ws
    }
    assert set(got) == set(expected)
    for d, (n_words, n_subwords) in expected.items():
        assert got[d]["n_words"] == n_words, d
        assert got[d]["n_subwords"] == n_subwords, d
        # Spark/DuckDB ROUND are HALF_UP, not Python's banker's rounding
        want = float(
            Decimal(n_subwords / n_words).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        assert abs(got[d]["fertility"] - want) < 1e-9, d
