"""LLM-pipeline operators: dedup family, similarity, text, multimodal (§2.N)."""

import math

import pytest

from pyspark.sql import functions as F, types as Ty

from pulsar_3_2_codedump_spark.catalog import load
from pulsar_3_2_codedump_spark.functions.dedup_ml import (
    base_hashes,
    minhash_signature,
    shingles,
)
from pulsar_3_2_codedump_spark.functions.multimodal import (
    MediaDecodeUnavailable,
    as_media_table,
    decode_image,
    extract_features,
)
from pulsar_3_2_codedump_spark.functions.similarity import cosine, sign_lsh_bucket
from tests.conftest import SF_DIR


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely different sentence with other words entirely")],
        "doc_id long, text string",
    )
    sh = df.select("doc_id", shingles(F.col("text")).alias("sh"))
    sig = sh.withColumn("hs", base_hashes(F.col("sh"))).select(
        "doc_id", *minhash_signature(F.col("hs"))
    )
    rows = {r["doc_id"]: tuple(r[f"h{j}"] for j in range(8)) for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_minhash_near_dup_mostly_agrees(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"  # 1 word differs
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sh = df.select("doc_id", shingles(F.col("text")).alias("sh"))
    sig = sh.withColumn("hs", base_hashes(F.col("sh"))).select(
        "doc_id", *minhash_signature(F.col("hs"))
    )
    rows = {r["doc_id"]: [r[f"h{j}"] for j in range(8)] for r in sig.collect()}
    agree = sum(1 for x, y in zip(rows[1], rows[2]) if x == y)
    assert agree >= 4  # jaccard = 6/10 shingles → expect most hashes equal


def test_cosine_exact_on_known_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 1.0], [1.0, 1.0]), (3, [2.0, 0.0], [1.0, 0.0])],
        "id long, a array<float>, b array<float>",
    )
    out = {r["id"]: r["c"] for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert abs(out[1] - 0.0) < 1e-12
    assert abs(out[2] - 1.0) < 1e-12
    assert abs(out[3] - 1.0) < 1e-12


def test_sign_lsh_bucket_range(spark):
    emb = load(spark, SF_DIR, "embeddings")
    buckets = emb.select(sign_lsh_bucket(F.col("embedding")).alias("b"))
    mn, mx = buckets.agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= mn and mx <= 255


def test_multimodal_feature_kernel_deterministic(spark):
    media = as_media_table(load(spark, SF_DIR, "documents")).limit(20)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    docs = {r["doc_id"]: r["text"] for r in load(spark, SF_DIR, "documents").limit(20).collect()}
    for mid, row in feats.items():
        raw = docs[mid].encode()
        assert row["n_bytes"] == len(raw)
        assert math.isclose(row["byte_mean"], sum(raw) / len(raw), rel_tol=1e-9)
        assert list(row["feature"])[0] == float(len(raw) % 256)


def test_multimodal_real_decode_is_gated():
    with pytest.raises(MediaDecodeUnavailable):
        decode_image(b"\x89PNG")


def test_media_metadata_prunes_blob(spark):
    """Metadata aggregates must not scan the blob column (column pruning)."""
    media = as_media_table(load(spark, SF_DIR, "documents"))
    agg = media.groupBy(F.col("meta.format")).agg(F.sum("meta.n_bytes"))
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert "blob" not in plan.split("Aggregate")[0]  # blob pruned before agg


def test_ivf_ann_full_probe_equals_brute_force(spark):
    """nprobe = all cells ⇒ IVF search is exactly brute-force top-k (every
    corpus vector lives in exactly one cell), independent of clustering."""
    from pulsar_3_2_codedump_spark.functions.similarity import (
        IVF_K, QUERY_STRIDE, ivf_ann_search,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ivf = ivf_ann_search(spark, emb, queries, nprobe=IVF_K).collect()
    # brute force over the same queries
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    from pyspark.sql.window import Window as W

    scored = (
        F.broadcast(queries)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    bf = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine_sim"), "rank")
        .collect()
    )
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, bf))


def test_ivf_ann_nprobe_prunes_and_keeps_recall(spark):
    """nprobe=2 of 8 cells: candidate set shrinks to ~nprobe/k of the corpus
    while recall vs brute force stays high (clustered data ⇒ neighbors
    co-locate in probed cells)."""
    from pulsar_3_2_codedump_spark.functions.similarity import (
        IVF_K, QUERY_STRIDE, ivf_ann_search,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    full = {(r["query_id"], r["neighbor_id"]) for r in ivf_ann_search(spark, emb, queries, nprobe=IVF_K).collect()}
    pruned = ivf_ann_search(spark, emb, queries, nprobe=2).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in pruned}
    recall = len(got & full) / len(full)
    assert recall >= 0.5, f"recall {recall} too low"
    # every result's rank list is still dense per query
    by_q = {}
    for r in pruned:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_resize_bytes_downsamples_deterministically(spark):
    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.multimodal import as_media_table, resize_bytes

    media = as_media_table(load(spark, SF_DIR, "documents")).filter(F.col("media_id") < 20)
    out = {r["media_id"]: r for r in resize_bytes(media, stride=4).collect()}
    src = {r["media_id"]: bytes(r["blob"]) for r in media.collect()}
    assert set(out) == set(src)
    for mid, blob in src.items():
        want = blob[::4]
        assert bytes(out[mid]["blob"]) == want
        assert out[mid]["n_bytes"] == len(want)
        assert out[mid]["checksum"] == sum(want)


def test_gopher_rules_pass_all_bounded(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = load_all()["gopher_quality_rules"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == 500
    for r in out:
        for rule in ("pass_wordcount", "pass_meanlen", "pass_alpha", "pass_stopword"):
            assert 0 <= r["pass_all"] <= r[rule] <= r["n_docs"]
    # the rule battery must actually discriminate on this corpus
    assert any(r["pass_all"] < r["n_docs"] for r in out)


def test_char_entropy_within_information_bounds(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = load_all()["char_entropy"].fn(spark, SF_DIR).collect()
    assert len(out) == 200
    for r in out:
        assert r["n_distinct_chars"] <= r["n_chars_tok"]
        # 0 <= H <= log2(#distinct symbols)
        assert -1e-9 <= r["char_entropy"] <= math.log2(r["n_distinct_chars"]) + 1e-9


def test_perplexity_proxy_nonnegative_and_zero_for_deterministic_context(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = load_all()["perplexity_proxy"].fn(spark, SF_DIR).collect()
    assert len(out) == 200
    assert all(r["avg_neg_log2p"] >= 0 for r in out)
    # a context that always predicts the same next token has -log2(1) = 0:
    # synth corpus where every bigram is unique per prev ("a b", "c d", ...)
    # would score 0; the real corpus must not be fully deterministic
    assert any(r["avg_neg_log2p"] > 0 for r in out)


def test_ann_recall_at_k_invariants(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = load_all()["ann_recall_at_k"].fn(spark, SF_DIR).collect()
    assert len(out) == 10  # 500 vectors / stride 50
    for r in out:
        assert r["n_exact"] == 3
        assert 0 <= r["n_hit"] <= 3
        assert abs(r["recall_at_3"] - r["n_hit"] / 3) < 5e-5


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's core guarantee: two docs sharing a run of >= w+k-1 words
    share at least one fingerprint; disjoint docs share none."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import SHINGLE_K, _md5int

    k, w = SHINGLE_K, 4
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words >= w+k-1=6
    df = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five"),
            (2, f"six seven {shared} eight nine ten"),
            (3, "completely different words everywhere nothing matches here at all"),
        ],
        "doc_id long, text string",
    )
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (k - 1), F.lit(1)))
    h = F.transform(idx, lambda i: _md5int(F.concat_ws(" ", F.slice(ws, i, k))))
    hashed = df.select("doc_id", h.alias("h"))
    nw = F.greatest(F.size("h") - (w - 1), F.lit(1))
    mins = F.transform(F.sequence(F.lit(1), nw), lambda i: F.array_min(F.slice("h", i, w)))
    fps = {r["doc_id"]: set(r["fps"]) for r in hashed.select("doc_id", F.array_distinct(mins).alias("fps")).collect()}
    assert fps[1] & fps[2], "shared run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_cross_corpus_dedup_drops_exactly_injected_overlap(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = load_all()["cross_corpus_dedup"].fn(spark, SF_DIR).collect()
    n_cand = sum(r["n_candidates"] for r in out)
    n_dropped = sum(r["n_dropped"] for r in out)
    assert n_cand == 250
    # every 4th candidate (doc_id % 4 == 0, doc_id in [250, 500)) is a copy
    assert n_dropped == len([i for i in range(250, 500) if i % 4 == 0])
    for r in out:
        assert r["n_dropped"] + r["n_retained"] == r["n_candidates"]


def test_length_bucketing_contiguous_quartiles(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = sorted(
        load_all()["length_bucketing"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bucket_id"],
    )
    assert [r["bucket_id"] for r in out] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in out) == 500
    for a, b in zip(out, out[1:]):
        assert a["max_tokens"] <= b["min_tokens"]  # buckets are contiguous ranges


def test_embedding_centroids_bounds(spark):
    from pulsar_3_2_codedump_spark.queries import load_all

    out = load_all()["embedding_centroids"].fn(spark, SF_DIR).collect()
    dims = {r["dim"] for r in out}
    assert dims == set(range(1, max(dims) + 1))  # dense 1..d, fixture-dim agnostic
    for r in out:
        assert r["min_v"] - 1e-9 <= r["mean_v"] <= r["max_v"] + 1e-9
        assert r["n_vectors"] > 0


def test_pq_encoding_shape_and_code_range(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        pq_codebook,
    )

    emb = load(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb).collect()
    # PQ_K codewords x PQ_M subspaces, each subvector PQ_SUB wide
    assert len(cb) == PQ_K * PQ_M
    assert {r["code_id"] for r in cb} == set(range(1, PQ_K + 1))
    assert all(len(r["cw"]) == 4 for r in cb)


def test_pq_adc_beats_chance_recall(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PQ_TOP_K,
        pq_adc_ann_topk,
    )

    n = load(spark, SF_DIR, "embeddings").count()
    pq = pq_adc_ann_topk(spark, SF_DIR)
    rows = pq.collect()
    qids = {r["query_id"] for r in rows}
    assert all(r["adc_dist"] >= 0.0 for r in rows)
    assert all(1 <= r["rank"] <= PQ_TOP_K for r in rows)

    # recall@k of ADC vs exact L2 top-k: must beat random-candidate recall
    # by a wide margin (random would be ~ PQ_TOP_K / n)
    exact = {}
    emb = {r["vec_id"]: r["embedding"] for r in
           load(spark, SF_DIR, "embeddings").collect()}
    import heapq

    for q in qids:
        qv = emb[q]
        d = [(sum((a - b) ** 2 for a, b in zip(qv, v)), vid)
             for vid, v in emb.items() if vid != q]
        exact[q] = {vid for _, vid in heapq.nsmallest(PQ_TOP_K, d)}
    hits = sum(1 for r in rows if r["neighbor_id"] in exact[r["query_id"]])
    recall = hits / len(rows)
    assert recall >= 0.3, f"ADC recall {recall} vs chance {PQ_TOP_K / n}"


def test_semdedup_prune_matches_leader_rule(spark):
    import numpy as np

    from pulsar_3_2_codedump_spark.functions.similarity import (
        SEMDEDUP_T,
        semdedup_prune,
    )

    out = {r["vec_id"]: r for r in semdedup_prune(spark, SF_DIR).collect()}
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in load(spark, SF_DIR, "embeddings").collect()}
    # recompute the leader rule inside the clusters the engine assigned
    cluster = {v: out[v]["cluster_id"] for v in out}
    ids = sorted(emb)
    norm = {v: emb[v] / np.linalg.norm(emb[v]) for v in ids}
    for v in ids:
        has_leader = any(
            u < v and cluster[u] == cluster[v]
            and float(norm[u] @ norm[v]) >= SEMDEDUP_T
            for u in ids
        )
        assert out[v]["pruned"] == has_leader, (v, out[v])
    assert any(r["pruned"] for r in out.values())  # the prune leg fires


def test_pq_arrow_kernel_matches_expr(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = load(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb)
    expr = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb, "expr").collect()}
    arrow = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb, "arrow").collect()}
    assert expr == arrow  # bit-identical codes, not just close


def test_pq_adc_arrow_matches_jvm_fold(spark):
    from pyspark.sql.window import Window as W

    from pulsar_3_2_codedump_spark.functions.similarity import (
        QUERY_STRIDE,
        pq_adc_dist,
        pq_adc_search_arrow,
        pq_codebook,
        pq_encode,
        pq_query_luts,
    )

    emb = load(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb)
    codes = pq_encode(emb, cb, "arrow")
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    arrow = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in pq_adc_search_arrow(codes, cb, q).collect()
    }
    jvm = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in codes.crossJoin(F.broadcast(pq_query_luts(q, cb)))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                pq_adc_dist().alias("adc_dist"))
        .collect()
    }
    assert arrow == jvm  # bit-identical distances across kernels


def test_ivfadc_results_come_only_from_probed_cells(spark):
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PQIVF_NPROBE,
        _argmin_cell,
        _ivf_cells,
        ivfadc_ann_topk,
    )

    emb = load(spark, SF_DIR, "embeddings")
    cells = _ivf_cells(emb)
    assign = {r["vec_id"]: r["cell_id"] for r in
              _argmin_cell(emb, cells, "vec_id", 1).collect()}
    probes = {}
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    for r in _argmin_cell(q, cells, "query_id", PQIVF_NPROBE).collect():
        probes.setdefault(r["query_id"], set()).add(r["cell_id"])
    rows = ivfadc_ann_topk(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(probes[r["query_id"]]) == PQIVF_NPROBE
        # the pruning contract: every neighbor lives in a probed cell
        assert assign[r["neighbor_id"]] in probes[r["query_id"]]


def test_minhash_estimate_is_unbiasedish_on_candidates(spark):
    from pulsar_3_2_codedump_spark.functions.dedup_ml import minhash_estimate_error

    rows = minhash_estimate_error(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["err"] - round(r["est_jaccard"] - r["exact_jaccard"], 4)) <= 1e-9
    # exact duplicates must estimate 1.0 exactly (identical signatures)
    for r in rows:
        if r["exact_jaccard"] == 1.0:
            assert r["est_jaccard"] == 1.0


def test_cdc_boundaries_are_content_anchored(spark):
    # inserting a prefix shifts every fixed-size block but CDC chunks
    # re-synchronize: the tail chunks of the shifted doc match the original
    import tempfile

    from pulsar_3_2_codedump_spark.functions.dedup_ml import cdc_chunk_dedup

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill every day") * 2
    docs = spark.createDataFrame(
        [(1, base, "en", "s1", len(base)),
         (2, "PREFIX-INSERTED " + base, "en", "s2", len(base) + 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in cdc_chunk_dedup(spark, d).collect()}
    # sanity on shape: multiple chunks per doc, ratios in (0, 1]
    for r in out.values():
        assert r["total_chunks"] > 3
        assert 0 < r["unique_ratio"] <= 1.0


def test_cdc_short_docs_one_chunk(spark):
    # docs shorter than the window (incl. empty) have NO boundary positions
    # and come back as exactly one whole-document chunk — the short-doc
    # clamp class the shingles/chunk_payloads helpers also guard
    import tempfile

    from pulsar_3_2_codedump_spark.functions.dedup_ml import cdc_chunk_dedup

    docs = spark.createDataFrame(
        [(1, "", "en", "s_empty", 0),
         (2, "tiny", "en", "s_tiny", 4),
         (3, "exactly7", "en", "s_seven", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in cdc_chunk_dedup(spark, d).collect()}
    for r in out.values():
        assert r["total_chunks"] == 1
        assert r["n_docs"] == 1
    assert out["s_empty"]["avg_chunk_len"] == 0.0
    assert out["s_tiny"]["avg_chunk_len"] == 4.0


def test_cdc_rolling_kernel_matches_per_window_reference():
    # the O(1)-per-char rolling form (prefix series + modular-inverse
    # powers, numpy uint32 wraparound) must be BIT-IDENTICAL to the direct
    # per-window polynomial hash the oracle SQL transcribes — same pin
    # discipline as the PQ Arrow kernels
    import random

    import numpy as np

    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        _cdc_boundaries_np,
        _cdc_boundaries_ref,
    )

    rng = random.Random(7)
    cases = ["", "a", "short", "exactly8", "the quick brown fox " * 40,
             "ünïcødé ẞtrings — 日本語のテキストもここにある " * 10,
             "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"]
    for _ in range(100):
        n = rng.randint(0, 500)
        cases.append("".join(chr(rng.randint(32, 0x2FFF)) for _ in range(n)))
    for tx in cases:
        assert _cdc_boundaries_np(tx, np) == _cdc_boundaries_ref(tx)


def test_kmeans_lloyd_iterations_monotone_inertia(spark):
    # Lloyd guarantees J(assign2, cent1) <= J(assign1, seeds): recomputing
    # means then reassigning never increases total inertia. Also the
    # clusters partition the corpus and every cluster keeps its seed-id key.
    from pyspark.sql import functions as F

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.similarity import (
        KMEANS_K,
        _sqdist,
        kmeans_lloyd_iterations,
    )
    from tests.conftest import SF_DIR

    out = kmeans_lloyd_iterations(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_members"] for r in out) == n
    assert 1 <= len(out) <= KMEANS_K

    # recompute J(assign1, seeds) independently
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    seeds = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(KMEANS_K)
        .select(F.col("vec_id").alias("cluster_id"), F.col("v").alias("c"))
    )
    j1 = (
        emb.crossJoin(F.broadcast(seeds))
        .withColumn("dist", _sqdist(F.col("v"), F.col("c")))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    j2 = sum(r["inertia"] for r in out)
    assert j2 <= j1 + 1e-6


def test_pca_power_iteration_matches_numpy_and_aligns_with_svd(spark):
    # (1) bit-exact: the fixed-point recurrence replayed in numpy int64
    # must equal the Spark/oracle output; (2) semantic: the fixed-point
    # trajectory must track FLOAT power iteration (same start) essentially
    # exactly, and the Rayleigh quotient must be strictly increasing —
    # the data's near-flat spectrum (sigma2/sigma1 ~ 0.97) means no
    # 3-iteration method converges to the top singular vector itself.
    import numpy as np

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PI_ITERS,
        PI_SCALE,
        pca_power_iteration,
    )
    from tests.conftest import SF_DIR

    rows = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Q = np.floor(X * PI_SCALE + 0.5).astype(np.int64)

    v = np.full(Q.shape[1], PI_SCALE, dtype=np.int64)
    history = []
    for _ in range(PI_ITERS):
        s = Q @ v
        sd = np.sign(s) * (np.abs(s) // PI_SCALE)
        n = Q.T @ sd
        m_idx = np.lexsort((np.arange(len(n)), -np.abs(n)))[0]
        m = n[m_idx]
        v = np.sign(n) * np.sign(m) * (np.abs(n) // (np.abs(m) // PI_SCALE + 1))
        history.append(v.copy())

    got = sorted(pca_power_iteration(spark, SF_DIR).collect(), key=lambda r: r["dim"])
    assert [r["v2"] for r in got] == history[1].tolist()
    assert [r["v3"] for r in got] == history[2].tolist()

    vf = np.ones(X.shape[1], dtype=np.float64)
    rayleighs = []
    for k in range(PI_ITERS):
        w = X.T @ (X @ vf)
        rayleighs.append((vf @ w) / (vf @ vf))
        vf = w / np.linalg.norm(w)
        vq = history[k].astype(np.float64)
        cos = abs(vq @ vf) / (np.linalg.norm(vq) * np.linalg.norm(vf))
        assert cos > 0.9999, (k, cos)
    assert rayleighs == sorted(rayleighs) and rayleighs[0] < rayleighs[-1]


def test_ppm_decoder_roundtrips_a_known_image_and_rejects_malformed():
    """The PPM decode path is REAL (no PIL): a hand-built 2×2 P6 image
    round-trips to the exact pixel grid, and malformed inputs fail loudly
    rather than producing garbage statistics."""
    import numpy as np
    import pytest

    from pulsar_3_2_codedump_spark.functions.multimodal import decode_ppm

    blob = b"P6\n2 2\n255\n" + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    w, h, px = decode_ppm(blob)
    assert (w, h) == (2, 2)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]]
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)       # greyscale magic
    with pytest.raises(ValueError, match="payload"):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 11)      # truncated payload
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)    # 16-bit channels
    with pytest.raises(ValueError, match="header"):
        decode_ppm(b"P6\n2")                              # truncated header


def test_encode_ppm_emits_genuine_image_files(spark):
    """The encoder's output is a real image file, not a fake: the decoder is
    a pure function, so parse one blob directly and check dims + a pixel
    against the generator formula."""
    from pulsar_3_2_codedump_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
        ppm_dims,
    )

    ids = spark.range(5, 6).select(F.col("id").alias("media_id"))
    blob = bytes(encode_ppm(ids).collect()[0]["blob"])
    w, h, px = decode_ppm(blob)
    d = 5
    # ppm_dims is the Python source of truth; the oracle SQL inlines the
    # same formula — pin them against each other for every small id
    assert (w, h) == ppm_dims(d)
    for mid in range(25):
        assert ppm_dims(mid) == (4 + mid % 5, 3 + mid % 4)
    r, c = 1, 2
    assert px[r, c].tolist() == [
        (d * 7 + r * 13 + c * 31) % 256,
        (d * 11 + r * 17 + c * 5) % 256,
        (d * 3 + r * 29 + c * 23) % 256,
    ]


def test_opq_permutation_bijective_and_cross_engine_equal(spark):
    """opq_dim_order is a bijection of 1..64 AND matches the oracle's SQL
    perm CTE value-for-value (the permutation is the only new moving part
    of opq_rotated_adc_topk — downstream is the pinned PQ harness)."""
    import duckdb

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.similarity import (
        _D_OPQ_PERM,
        PQ_M,
        PQ_SUB,
        opq_dim_order,
    )

    srcs = opq_dim_order(load(spark, SF_DIR, "embeddings"))
    d = PQ_M * PQ_SUB
    assert sorted(srcs) == list(range(1, d + 1))  # bijection of source dims

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    sql_perm = dict(
        con.execute(f"WITH {_D_OPQ_PERM} SELECT dim, j FROM perm").fetchall()
    )
    # srcs[j-1] = source dim for output position j  <=>  sql j per dim
    for j, dim in enumerate(srcs, start=1):
        assert sql_perm[dim] == j, f"dim {dim}: spark j={j} sql j={sql_perm[dim]}"


def test_opq_allocation_balances_subspace_variance(spark):
    """Eigenvalue allocation's actual objective: the per-subspace variance
    sums under the OPQ permutation are far more BALANCED than the identity
    layout's (here: spread shrinks >= 2x; measured ~8x on this fixture).
    The downstream quantization-ERROR gain of OPQ only materializes on
    anisotropic corpora — this fixture is nearly isotropic (per-dim
    variance 0.013-0.019), where error is flat within one-Lloyd noise
    (measured +0.9%), so the balance criterion is the right pin."""
    import numpy as np

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PQ_M,
        PQ_SUB,
        opq_dim_order,
    )

    emb = load(spark, SF_DIR, "embeddings")
    x = np.vstack(
        [r["embedding"] for r in emb.select("embedding").collect()]
    ).astype(np.float64)
    v = x.var(axis=0)
    srcs = opq_dim_order(emb)
    rot = [
        sum(v[srcs[m * PQ_SUB + b] - 1] for b in range(PQ_SUB))
        for m in range(PQ_M)
    ]
    ident = [
        sum(v[m * PQ_SUB + b] for b in range(PQ_SUB)) for m in range(PQ_M)
    ]
    rot_spread = max(rot) - min(rot)
    id_spread = max(ident) - min(ident)
    assert rot_spread * 2 <= id_spread, (rot_spread, id_spread)


def test_exact_substring_dedup_matches_python_suffix_scan(spark):
    """Independent Python mirror of the suffix-ordering dedup at sf0.001:
    same tokenization, suffix truncation and bucketing, but the Python
    side computes each suffix's max LCP against ALL other suffixes in its
    bucket (brute force) — passing proves the engine's sorted-adjacent
    LCP equals the all-pairs max (the suffix-array property) AND that the
    per-doc aggregation is right."""
    import re
    from collections import defaultdict

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        ESD_BUCKET_CAP,
        ESD_CAP,
        ESD_MIN,
        ESD_WORDS,
        exact_substring_dedup,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_DIR, "documents").collect()
    }
    buckets = defaultdict(list)
    n_starts = {}
    for doc_id, text in docs.items():
        ws = re.split(r"\s+", text.strip().lower())
        n_starts[doc_id] = len(ws)
        for pos in range(1, len(ws) + 1):
            s = " ".join(ws[pos - 1 : pos - 1 + ESD_WORDS])[:ESD_CAP]
            if len(s) >= ESD_MIN:
                buckets[s[:ESD_MIN]].append((doc_id, pos, s))

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    dup_starts = defaultdict(int)
    max_dup = defaultdict(int)
    saturated = defaultdict(bool)
    for members in buckets.values():
        if len(members) > ESD_BUCKET_CAP:  # hot-bucket saturation rule
            for doc_id, pos, s in members:
                dup_starts[doc_id] += 1
                max_dup[doc_id] = max(max_dup[doc_id], len(s))
                saturated[doc_id] = True
            continue
        for doc_id, pos, s in members:
            best = max(
                (
                    lcp(s, s2)
                    for d2, p2, s2 in members
                    if (d2, p2) != (doc_id, pos)
                ),
                default=0,
            )
            if best >= ESD_MIN:
                dup_starts[doc_id] += 1
            max_dup[doc_id] = max(max_dup[doc_id], best)

    got = {
        r["doc_id"]: (
            r["n_starts"], r["dup_starts"], r["max_dup_len"], r["saturated"]
        )
        for r in exact_substring_dedup(spark, SF_DIR).collect()
    }
    assert set(got) == set(docs)
    for doc_id in docs:
        expect = (
            n_starts[doc_id],
            dup_starts[doc_id],
            max_dup[doc_id],
            saturated[doc_id],
        )
        assert got[doc_id] == expect, f"doc {doc_id}: {got[doc_id]} != {expect}"


def test_exact_substring_hot_bucket_cap_boundary(spark):
    """Pins the r11 skew cap at its boundary: a bucket with EXACTLY
    bucket_cap members takes the exact sorted-neighbor path; one past the
    cap takes the saturated path (dup_start still exact — >= 2 members
    decide it; dup_len saturates to length(s)). The same corpus run at a
    cap large enough for both buckets must give the exact answers, so the
    test also proves the cap only ever touches over-cap buckets."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        exact_substring_stats,
    )

    rows = [
        # bucket 'a'*20 — 3 members (AT cap=3): exact path
        (1, "a" * 20 + "X" * 10),            # LCP vs doc2 = 25
        (2, "a" * 20 + "X" * 5 + "Y" * 5),   # LCP 25 / 20
        (3, "a" * 20 + "Z" * 10),            # LCP vs doc2 = 20
        # bucket 'b'*20 — 4 members (OVER cap=3): saturated path;
        # exact answers would be 20 everywhere (all diverge at char 21)
        (4, "b" * 20 + "P" * 5),             # len 25
        (5, "b" * 20 + "Q" * 12),            # len 32
        (6, "b" * 20 + "R" * 30),            # len 50
        (7, "b" * 20),                       # len 20 (eligibility edge)
        # singleton bucket: no duplication either way
        (8, "c" * 30),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def result(cap):
        return {
            r["doc_id"]: (
                r["n_starts"], r["dup_starts"], r["max_dup_len"],
                r["saturated"],
            )
            for r in exact_substring_stats(docs, bucket_cap=cap).collect()
        }

    capped = result(3)
    assert capped[1] == (1, 1, 25, False)
    assert capped[2] == (1, 1, 25, False)
    assert capped[3] == (1, 1, 20, False)
    # saturated: dup_len = length(s), dup_starts exact
    assert capped[4] == (1, 1, 25, True)
    assert capped[5] == (1, 1, 32, True)
    assert capped[6] == (1, 1, 50, True)
    assert capped[7] == (1, 1, 20, True)
    assert capped[8] == (1, 0, 0, False)

    exact = result(4)  # both buckets inside the cap -> fully exact
    assert exact[4] == (1, 1, 20, False)
    assert exact[5] == (1, 1, 20, False)
    assert exact[6] == (1, 1, 20, False)
    assert exact[7] == (1, 1, 20, False)
    for d in (1, 2, 3, 8):
        assert exact[d] == capped[d]


def test_exact_substring_escalation_boundary_is_bit_identical(spark):
    """Pins the r12 mega-bucket escalation at its boundary (VERDICT r11
    #2): the gate is a PLAN choice, so every (threshold, cap) routing —
    gate off, gate on with the bucket below / at / above the escalation
    threshold, and the sampling-noise trap (a candidate whose TRUE size
    is inside bucket_cap, which the exact second-pass census must send
    back to the exact LCP path) — must produce bit-identical frames."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        exact_substring_stats,
    )

    rows = [
        # bucket 'a'*20 — 5 members (mega under threshold=5)
        (1, "a" * 20 + "V" * 9),
        (2, "a" * 20 + "W" * 8),
        (3, "a" * 20 + "X" * 7),
        (4, "a" * 20 + "Y" * 6),
        (5, "a" * 20 + "Z" * 5),
        # bucket 'b'*20 — 3 members (over cap=2, below threshold=5)
        (6, "b" * 20 + "P" * 5),
        (7, "b" * 20 + "Q" * 12),
        (8, "b" * 20 + "R" * 30),
        # singleton
        (9, "c" * 30),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def result(**kw):
        return sorted(
            tuple(r) for r in exact_substring_stats(
                docs, bucket_cap=2, probe_fraction=1.0, **kw
            ).collect()
        )

    gate_off = result(escalate_threshold=None)
    # both over-cap buckets saturate regardless of the route
    by_id = {t[0]: t for t in gate_off}
    assert by_id[1][3] == 29 and by_id[1][4] is True
    assert by_id[6][3] == 25 and by_id[6][4] is True
    assert by_id[9][2] == 0 and by_id[9][4] is False

    # gate fires for bucket a only (5 >= 5), b stays on the cold path
    assert result(escalate_threshold=5) == gate_off
    # gate fires for both over-cap buckets
    assert result(escalate_threshold=3) == gate_off
    # gate just misses the biggest bucket (6 > 5): nothing escalates
    assert result(escalate_threshold=6) == gate_off

    # sampling-noise trap: threshold below the cap makes the SINGLETON a
    # candidate too — the exact census (true size 1 <= cap) must reject
    # it, or its dup_len would wrongly saturate to 30
    assert result(escalate_threshold=1) == gate_off


def test_exact_substring_probe_env_gate(spark, monkeypatch):
    """SPARK_GRAFT_ESD_NO_PROBE keeps the registered query's construction
    action-free (planning-only sweeps), with identical results."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        exact_substring_dedup,
    )

    with_probe = sorted(
        tuple(r) for r in exact_substring_dedup(spark, SF_DIR).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_ESD_NO_PROBE", "1")
    without = sorted(
        tuple(r) for r in exact_substring_dedup(spark, SF_DIR).collect()
    )
    assert with_probe == without


def test_data_proportional_joins_never_broadcast(spark):
    """Regression pin for the r10 static-broadcast failure: over an
    ESTIMATE-UNRELIABLE input (in-memory frames report tiny sizeInBytes,
    like the scale smoke's range-backed corpora), Catalyst would happily
    broadcast the duplicated-ngram / per-doc aggregate frames — which are
    data-proportional and materialized ~3 GB through the driver at 5M
    docs before the MERGE hints pinned them to sort-merge joins. Assert
    the executed plans contain no BroadcastExchange at all under exactly
    those conditions, so a refactor dropping a hint fails here instead
    of at 50M rows."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import (
        exact_substring_stats,
        ngram_coverage,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} the quick brown fox w{i % 3} jumps over it")
         for i in range(64)],
        "doc_id long, text string",
    )
    from pulsar_3_2_codedump_spark.functions.dedup_ml import dedup_span_removal

    for frame in (
        ngram_coverage(docs),
        exact_substring_stats(docs),
        dedup_span_removal(spark, SF_DIR),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        assert "SortMergeJoin" in plan


def test_ivfpq_residual_invariants(spark):
    """Pins the residual-quantizer construction (ivfpq_residual_topk):
    (1) every assigned residual equals the exact float64 subtraction
    embedding - centroid of the vector's NEAREST cell (verified against a
    numpy mirror of the same op); (2) the IVF invariant — every emitted
    neighbor shares a probed cell with its query; (3) ranks are a dense
    1..k prefix per query. Cross-engine arithmetic parity is the driver
    hash's job; these pin the construction itself."""
    import numpy as np

    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.similarity import (
        PQ_TOP_K,
        PQIVF_NPROBE,
        QUERY_STRIDE,
        _ivf_cells,
        ivfpq_residual_topk,
    )
    from pyspark.sql import functions as F

    emb = load(spark, SF_DIR, "embeddings")
    cells = {r["cell_id"]: np.array(r["cent"], dtype=np.float64)
             for r in _ivf_cells(emb).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}

    def nearest_cells(x, k):
        d = sorted(
            (float(((x - c) ** 2).sum()), cid) for cid, c in cells.items()
        )
        return [cid for _, cid in d[:k]]

    assign = {v: nearest_cells(x, 1)[0] for v, x in vecs.items()}
    probes = {
        v: set(nearest_cells(x, PQIVF_NPROBE))
        for v, x in vecs.items()
        if v % QUERY_STRIDE == 0
    }

    # (1) residual exactness on the assigned frame (rebuild the same frame)
    residual = F.zip_with(
        F.col("embedding"), F.col("cent"),
        lambda a, b: a.cast("double") - b.cast("double"),
    )
    from pyspark.sql.window import Window as W

    w1 = W.partitionBy("vec_id").orderBy("sqd", "cell_id")
    from pulsar_3_2_codedump_spark.functions.similarity import _sqdist

    got_res = (
        emb.crossJoin(F.broadcast(_ivf_cells(emb)))
        .withColumn("sqd", _sqdist(F.col("embedding"), F.col("cent")))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id", residual.alias("r"))
        .collect()
    )
    for row in got_res:
        assert row["cell_id"] == assign[row["vec_id"]], row["vec_id"]
        want = vecs[row["vec_id"]] - cells[row["cell_id"]]
        assert np.array_equal(np.array(row["r"]), want), row["vec_id"]

    # (2)+(3) on the emitted top-k
    out = ivfpq_residual_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        assert assign[r["neighbor_id"]] in probes[r["query_id"]], r
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= PQ_TOP_K


def test_ivf_cells_materializes_once_and_plan_only_stays_lazy(spark, monkeypatch):
    """Pins the r12 materialize-once contract of _ivf_cells: in product
    mode the centroid frame is a driver-local scan (ExistingRDD from the
    collected 16 rows — centroid derivation = exactly ONE corpus pass;
    downstream broadcasts carry an exact size), while under
    SPARK_GRAFT_PLAN_ONLY (the flip-audit sweep) construction stays
    action-free and the plan keeps the Limit-bounded lineage the
    boundedness classifier judges. Rows must be identical in both modes —
    materialization is a plan choice, never an answer."""
    from pulsar_3_2_codedump_spark.catalog import load
    from pulsar_3_2_codedump_spark.functions.similarity import _ivf_cells

    emb = load(spark, SF_DIR, "embeddings")

    monkeypatch.delenv("SPARK_GRAFT_PLAN_ONLY", raising=False)
    mat = _ivf_cells(emb)
    mat_plan = mat._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in mat_plan or "LocalTableScan" in mat_plan, mat_plan
    assert "FileScan" not in mat_plan, mat_plan

    monkeypatch.setenv("SPARK_GRAFT_PLAN_ONLY", "1")
    lazy = _ivf_cells(emb)
    lazy_plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" in lazy_plan, lazy_plan
    assert "TakeOrderedAndProject" in lazy_plan or "GlobalLimit" in lazy_plan, lazy_plan

    key = lambda r: r["cell_id"]  # noqa: E731
    assert sorted(mat.collect(), key=key) == sorted(lazy.collect(), key=key)
    assert mat.schema == lazy.schema


def _py_sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _py_nn_descent(vecs):
    """Plain-Python mirror of similarity._nn_descent_edges: md5-sampled
    cells, rank-band seed over the distance-to-centroid ordering, then
    HNSW_ND_ROUNDS synchronous refinement rounds of candidates(u) =
    N(u) | N(N(u)) | reverse(N)(u). Returns (cents, assign, by_cell,
    rounds) where rounds[r] is the round-r edges dict."""
    import hashlib

    from pulsar_3_2_codedump_spark.functions.similarity import (
        HNSW_M,
        HNSW_ND_ROUNDS,
        HNSW_SEED_W,
        PQIVF_CELLS,
    )

    sq = _py_sq
    order = sorted(
        vecs, key=lambda v: (hashlib.md5(f"cell:{v}".encode()).hexdigest(), v)
    )
    cents = {i + 1: vecs[v] for i, v in enumerate(order[:PQIVF_CELLS])}
    assign = {
        v: min(cents, key=lambda c: (sq(vecs[v], cents[c]), c)) for v in vecs
    }
    by_cell: dict = {}
    for v, c in assign.items():
        by_cell.setdefault(c, []).append(v)
    rnk = {}
    for c, members in by_cell.items():
        for i, v in enumerate(
            sorted(members, key=lambda v: (sq(vecs[v], cents[c]), v))
        ):
            rnk[v] = i + 1
    edges = {
        v: sorted(
            (
                u
                for u in by_cell[assign[v]]
                if u != v and abs(rnk[u] - rnk[v]) <= HNSW_SEED_W
            ),
            key=lambda u: (sq(vecs[v], vecs[u]), u),
        )[:HNSW_M]
        for v in vecs
    }
    rounds = [edges]
    for _ in range(HNSW_ND_ROUNDS):
        prev = rounds[-1]
        rev: dict = {}
        for v, ns in prev.items():
            for u in ns:
                rev.setdefault(u, set()).add(v)
        edges = {}
        for v in vecs:
            cand = set(prev[v]) | rev.get(v, set())
            for u in prev[v]:
                cand.update(prev[u])
            cand.discard(v)
            edges[v] = sorted(
                cand, key=lambda u: (sq(vecs[v], vecs[u]), u)
            )[:HNSW_M]
        rounds.append(edges)
    return cents, assign, by_cell, rounds


def test_hnsw_beam_search_matches_python_walk(spark):
    """Independent third implementation of the HNSW beam search: the
    md5-sampled cells, NN-descent kNN digraph (r14 — rank-band seed plus
    synchronous refinement rounds), medoid entry and the EF-bounded hop
    recurrence are all recomputed in plain Python with the same
    sequential-fold float arithmetic and (score, vec_id) tiebreaks,
    then recall@K against a brute-force Python truth is compared row-for-
    row with the registered query — proving the Spark windows/joins
    implement the WALK, not just a statistic that happens to agree."""
    from pulsar_3_2_codedump_spark.functions.similarity import (
        HNSW_EF,
        HNSW_ENTRIES,
        HNSW_HOPS,
        HNSW_K,
        PQIVF_NPROBE,
        QUERY_STRIDE,
        hnsw_beam_search_recall,
    )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    sq = _py_sq

    def cos(a, b):
        import math

        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
        for x in a:
            n1 += x * x
        for y in b:
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    cents, assign, by_cell, rounds = _py_nn_descent(vecs)
    edges = rounds[-1]
    order_by_cell = {
        c: sorted(members, key=lambda v: (sq(vecs[v], cents[c]), v))
        for c, members in by_cell.items()
    }

    def entries(c):
        oc = order_by_cell[c]
        n = len(oc)
        return sorted({oc[(i * n) // HNSW_ENTRIES] for i in range(HNSW_ENTRIES)})

    want = {}
    for qid in sorted(v for v in vecs if v % QUERY_STRIDE == 0):
        qv = vecs[qid]
        probed = sorted(cents, key=lambda c: (sq(qv, cents[c]), c))[:PQIVF_NPROBE]
        beam = [u for c in probed if c in order_by_cell for u in entries(c)]
        for _ in range(HNSW_HOPS):
            frontier = {u for v in beam for u in edges[v]} | set(beam)
            frontier.discard(qid)
            beam = sorted(frontier, key=lambda v: (-cos(qv, vecs[v]), v))[:HNSW_EF]
        approx = set(
            sorted(beam, key=lambda v: (-cos(qv, vecs[v]), v))[:HNSW_K]
        )
        exact = sorted(
            (v for v in vecs if v != qid), key=lambda v: (-cos(qv, vecs[v]), v)
        )[:HNSW_K]
        n_hit = sum(1 for v in exact if v in approx)
        want[qid] = (HNSW_K, n_hit)
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"])
        for r in hnsw_beam_search_recall(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(h for _, h in want.values())  # the search actually finds truth


def test_nn_descent_convergence_matches_python_and_improves(spark):
    """The registered per-round graph statistic equals a plain-Python
    NN-descent mirror exactly (integer micro-units — no float-compare
    slack), and refinement genuinely improves the graph: each node's
    i-th-nearest kept edge at round r is <= its round r-1 counterpart
    (supersets re-ranked), verified per node, plus the aggregate sum
    strictly drops from seed to final round on this fixture."""
    import math

    from pulsar_3_2_codedump_spark.functions.similarity import (
        nn_descent_graph_convergence,
    )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    _, _, _, rounds = _py_nn_descent(vecs)
    want = {}
    for r, edges in enumerate(rounds):
        n = sum(len(ns) for ns in edges.values())
        s = sum(
            int(math.floor(_py_sq(vecs[v], vecs[u]) * 1e6))
            for v, ns in edges.items()
            for u in ns
        )
        want[r] = (n, s)
    got = {
        row["nd_round"]: (row["n_edges"], row["sum_d_micro"])
        for row in nn_descent_graph_convergence(spark, SF_DIR).collect()
    }
    assert got == want
    # per-node positional dominance: re-ranking a superset can only improve
    for prev, cur in zip(rounds, rounds[1:]):
        for v in vecs:
            dp = sorted(_py_sq(vecs[v], vecs[u]) for u in prev[v])
            dc = sorted(_py_sq(vecs[v], vecs[u]) for u in cur[v])
            for a, b in zip(dp, dc):
                assert b <= a, (v, dp, dc)
    # and on this fixture the refinement is not a no-op
    assert want[len(rounds) - 1][1] < want[0][1]


def test_broadcast_queries_contract_is_enforced(spark):
    """VERDICT r13 item 4: the stride-derived ANN query set is bounded by
    construction (_query_pred caps at QUERY_ID_CAP) and pq_adc_search_arrow
    REFUSES a query frame beyond ANN_MAX_QUERIES instead of collecting it
    driver-side."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from pulsar_3_2_codedump_spark.functions.similarity import (
        ANN_MAX_QUERIES,
        PQ_M,
        PQ_SUB,
        QUERY_ID_CAP,
        QUERY_STRIDE,
        _query_pred,
        pq_adc_search_arrow,
        pq_codebook,
    )

    dim = PQ_M * PQ_SUB
    # a synthetic corpus whose stride hits exceed the cap: the predicate
    # must bound the set to exactly ANN_MAX_QUERIES
    ids = spark.range(0, QUERY_ID_CAP + 10 * QUERY_STRIDE).select(
        F.col("id").alias("vec_id")
    )
    assert ids.filter(_query_pred()).count() == ANN_MAX_QUERIES

    # and the collect site refuses an over-cap frame outright
    emb = load(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb)
    over = (
        spark.range(0, ANN_MAX_QUERIES + 1)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(0.0)] * dim).alias("embedding"),
        )
    )
    codes = emb.limit(1).select(
        "vec_id", F.array(*[F.lit(1)] * PQ_M).alias("codes")
    )
    with _pytest.raises(ValueError, match="broadcast-queries contract"):
        pq_adc_search_arrow(codes, cb, over)


def test_esd_position_probe_detects_single_giant_doc(spark):
    """Pins the r13 position-sampled escalation census (VERDICT r12 item
    6): a mega-bucket concentrated in ONE document must be named by the
    gate. The r12 doc-sampled probe saw such a bucket only when the one
    giant doc happened to be sampled (~probe_fraction of the time — the
    documented evasion); sampling suffix START positions makes every
    bucket contribute ~probe_fraction of its true size regardless of doc
    boundaries, so detection is deterministic."""
    from pulsar_3_2_codedump_spark.functions.dedup_ml import _esd_mega_buckets

    giant = spark.range(0, 1).select(
        F.lit(9_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(F.sequence(F.lit(1), F.lit(30_000)), lambda _: F.lit("zzz")),
        ).alias("text"),
    )
    small = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(20)),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(5000))
                ),
            ),
        ).alias("text"),
    )
    t = (
        small.unionByName(giant)
        .select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("ws"))
    )
    hot = _esd_mega_buckets(
        t, bucket_cap=256, escalate_threshold=20_000, probe_fraction=0.02,
        max_hot=16,
    )
    assert hot == ["zzz zzz zzz zzz zzz "], hot
    # and a corpus with no mega-bucket stays un-escalated
    assert _esd_mega_buckets(
        small.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("ws")),
        bucket_cap=256, escalate_threshold=20_000, probe_fraction=0.02,
        max_hot=16,
    ) == []


def test_nsw_long_link_search_matches_python_walk(spark):
    """Independent third implementation of the NSW long-link search (r15):
    the md5-ring construction (first-hex-char buckets, (md5, vec_id) ring
    order, HNSW_LL_K successors with wraparound), the merged walk graph,
    the spread strata entries and the EF-bounded hop recurrence are all
    recomputed in plain Python with the engine's exact tiebreaks — the
    per-query (n_hit, entry_id_sum, n_entry, beam_id_sum) rows must agree
    row-for-row, proving the Spark windows/joins implement the WALK and
    the RING, not just a recall statistic."""
    import hashlib

    from pulsar_3_2_codedump_spark.functions.similarity import (
        HNSW_EF,
        HNSW_ENTRIES,
        HNSW_HOPS,
        HNSW_K,
        HNSW_LL_K,
        PQIVF_NPROBE,
        QUERY_ID_CAP,
        QUERY_STRIDE,
        nsw_long_link_search_recall,
    )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    sq = _py_sq

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
        for x in a:
            n1 += x * x
        for y in b:
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    cents, assign, by_cell, rounds = _py_nn_descent(vecs)
    graph = {v: set(ns) for v, ns in rounds[-1].items()}
    # md5-ring long links merged in
    hx = {v: hashlib.md5(f"ll:{v}".encode()).hexdigest() for v in vecs}
    buckets: dict = {}
    for v in vecs:
        buckets.setdefault(hx[v][0], []).append(v)
    for mem in buckets.values():
        order = sorted(mem, key=lambda v: (hx[v], v))
        n = len(order)
        for i, v in enumerate(order):
            for j in range(1, HNSW_LL_K + 1):
                u = order[(i + j) % n]
                if u != v:
                    graph[v].add(u)
    # spread strata entries per cell (1 + (i*csz) div E ranks, distinct)
    entries_by_cell = {}
    for c, members in by_cell.items():
        order = sorted(members, key=lambda v: (sq(vecs[v], cents[c]), v))
        csz = len(order)
        entries_by_cell[c] = sorted(
            {order[(i * csz) // HNSW_ENTRIES] for i in range(HNSW_ENTRIES)}
        )
    queries = [
        v for v in vecs if v % QUERY_STRIDE == 0 and v < QUERY_ID_CAP
    ]
    got = {
        r["query_id"]: r
        for r in nsw_long_link_search_recall(spark, SF_DIR).collect()
    }
    assert set(got) == set(queries)
    for q in queries:
        probe = sorted(cents, key=lambda c: (sq(vecs[q], cents[c]), c))[
            :PQIVF_NPROBE
        ]
        entries = [e for c in probe for e in entries_by_cell[c]]
        # engine recurrence: beam0 is the UNFILTERED entry set; each hop
        # expands beam u out-neighbors(beam), drops the query itself,
        # re-ranks by (cos desc, vec_id) and keeps EF
        beam = list(entries)
        for _ in range(HNSW_HOPS):
            frontier = set(beam)
            for v in beam:
                frontier |= graph[v]
            frontier.discard(q)
            beam = sorted(
                frontier, key=lambda v: (-cos(vecs[q], vecs[v]), v)
            )[:HNSW_EF]
        approx = set(
            sorted(beam, key=lambda v: (-cos(vecs[q], vecs[v]), v))[:HNSW_K]
        )
        exact = set(
            sorted(
                (v for v in vecs if v != q),
                key=lambda v: (-cos(vecs[q], vecs[v]), v),
            )[:HNSW_K]
        )
        row = got[q]
        assert row["n_exact"] == HNSW_K
        assert row["n_hit"] == len(approx & exact), q
        assert row["entry_id_sum"] == sum(entries), q
        assert row["n_entry"] == len(entries), q
        assert row["beam_id_sum"] == sum(beam), q
