"""Audit: which query plans BROADCAST a fact-derived frame?

A BroadcastExchange whose build subtree reads a FACT table (documents /
embeddings / events / lineitem / orders — tables that scale with the
corpus) and contains no Limit is a latent 100x-scale failure: Catalyst's
post-aggregate size estimates can look broadcastable at test SF while the
real relation is data-proportional (observed: duplicated_ngram_coverage's
duplicated-ngram set — ~3 GB materialized at 5M docs, killed the driver).

Broadcasts that are fine by construction and therefore excluded:
- subtree contains a Limit (top-k query sets, seed rows);
- subtree is a scalar/one-row aggregate (the scalar-subquery threshold
  pattern prints as BroadcastExchange of a 1-row agg — detected as a
  global agg: HashAggregate with an empty grouping key list);
- dimension-table scans (region/nation/supplier/part/customer at TPC-H
  shape stay metadata-scale relative to facts).

Prints one line per (query, suspicious broadcast subtree summary).
"""
import re
import sys

sys.path.insert(0, ".")

FACTS = ("documents", "embeddings", "events", "lineitem", "orders")


def _depth(s: str) -> int:
    m = re.match(r"^[\s:+|-]*", s)
    return len(m.group(0))


def subtree(lines, i):
    """Lines of the subtree rooted at lines[i] (tree-prefix indentation)."""
    d = _depth(lines[i])
    out = [lines[i]]
    for j in range(i + 1, len(lines)):
        if lines[j].strip() == "":
            break
        if _depth(lines[j]) <= d:
            break
        out.append(lines[j])
    return out


def _children(lines, i, end):
    """Indices of the IMMEDIATE children of lines[i] within lines[i+1:end]:
    the lines at the minimum tree depth below the node (a join prints its
    branches at one depth; deeper lines belong to those branches)."""
    below = [j for j in range(i + 1, end) if lines[j].strip()]
    if not below:
        return []
    child_d = min(_depth(lines[j]) for j in below)
    return [j for j in below if _depth(lines[j]) == child_d]


def audit_plan(plan: str):
    lines = plan.splitlines()
    hits = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        sub = subtree(lines, i)
        text = "\n".join(sub)
        fact = [t for t in FACTS if re.search(rf"\b{t}\b", text)]
        if not fact:
            continue
        if re.search(
            r"\b(Global|Local|Collect)?Limit\b|WindowGroupLimit"
            r"|TakeOrderedAndProject",
            text,
        ):
            continue  # bounded by construction
        # scalar (global) aggregate: HashAggregate(keys=[], ...)
        if re.search(r"HashAggregate\(keys=\[\]", text) and not re.search(
            r"HashAggregate\(keys=\[[^\]]", text
        ):
            continue
        hits.append((fact, sub[0].strip()[:100]))
    return hits


# Queries whose plan keeps a fact-backed BroadcastExchange even when the
# broadcast threshold is floored (-1), i.e. an EXPLICIT F.broadcast() of a
# fact-derived frame. Every entry is a documented measurement form: the
# broadcast side is a strided/filtered query set or a trained model whose
# size is a stated fraction of the corpus, and the query doc names the
# bucketed/partitioned variant as the scale path. Anything NOT in this
# list that still broadcasts under a floored threshold is a genuine
# class-(b) violation — tests/test_broadcast_audit.py enforces that
# (found there r11: six TPC-H shapes explicitly broadcasting ORDERS and
# a lineitem-derived per-part aggregate — all de-hinted to estimate-
# driven joins that flip to shuffle past the threshold).
_QUERY_SET = (
    "broadcasts the STRIDED QUERY SET (vec_id % stride) — corpus/stride "
    "rows by construction; the LSH/IVF/PQ-bucketed queries are the "
    "serving-scale path, this form exists to measure them"
)
EXPLICIT_MEASUREMENT_BROADCASTS: dict[str, str] = {
    "ann_ndcg_at_k": _QUERY_SET,
    "ann_recall_at_k": _QUERY_SET,
    "cosine_topk": _QUERY_SET,
    "filtered_vector_search": _QUERY_SET + "; plus a #queries-rows "
    "per-query candidate-count frame",
    "hard_negative_mining": _QUERY_SET,
    "hybrid_rrf_fusion": _QUERY_SET + "; lexical pools are per-query "
    "top-k bounded via partitioned windows (doc_id-keyed aggs sit above "
    "a WindowGroupLimit)",
    "ivfadc_ann_topk": "broadcasts per-query ADC lookup tables — "
    "#queries x M x 256 floats, bounded by the strided query set",
    "ivfpq_residual_topk": "broadcasts per-(query, probed-cell) residual "
    "ADC lookup tables — #queries x nprobe rows, bounded by the strided "
    "query set (the residual form of ivfadc_ann_topk's LUT broadcast)",
    "hnsw_beam_search_recall": _QUERY_SET + "; beam re-scoring joins the "
    "bounded (#queries x EF x (M+1)) frontier against the query set",
    "nsw_long_link_search_recall": _QUERY_SET + "; beam re-scoring joins "
    "the bounded (#queries x EF x (M+LL_K+1)) frontier against the query "
    "set; the entry/beam trajectory stats are #queries-row aggregates of "
    "the capped beam frames",
    "knn_label_vote": _QUERY_SET,
    "lsh_ann_topk": _QUERY_SET,
    "mmr_rerank": _QUERY_SET + "; the re-ranked pool is top-"
    "MMR_POOL bounded, so the MMR steps add O(pool^2 K) per query",
    "quantized_ann_recall": _QUERY_SET,
    "truncated_embedding_recall": _QUERY_SET,
    "pmi_collocations": "broadcasts the unigram count model — "
    "vocab-bounded (Heaps-law sublinear); the query doc names dropping "
    "the explicit broadcast under an uncapped vocab",
    "cross_corpus_dedup": "broadcasts the REFERENCE corpus fingerprint "
    "set — decontamination/eval sets are metadata-scale by design "
    "relative to the training corpus",
}


# Queries whose fn() unavoidably runs Spark jobs at DataFrame construction
# (a real publish/replay through the topic sink — the execution IS the
# operator under test), which a planning sweep must not run under an
# abnormal floored threshold (ADVICE r11: the flip sweep is plan-only by
# contract — like the streaming_ skip, these are excluded with the reason
# stated here). exactly_once_replay_audit's own joins are metadata-scale
# manifest frames; the audited query-shape core is the batch aggregate its
# oracle hashes.
# r13: mmr_rerank left the set — its greedy-step checkpoints now route
# through catalog.ckpt_unless_plan_only(cut_plan_only=True), so under
# SPARK_GRAFT_PLAN_ONLY construction is action-free. exactly_once_replay_audit
# stays: it drives the REAL topic sink (append/replay/commit) at build time —
# the execution IS the operator under test.
CONSTRUCTION_EXECUTES = {
    # fn() runs the full topic publish/replay pipeline at build time and
    # returns a LocalTableScan audit result — nothing plannable to sweep
    "exactly_once_replay_audit",
    # fn() builds two real topic clusters, replicates, writes snapshot
    # markers and runs both cursor translations (collects ack-range and
    # marker metadata) before emitting the bounded audit rows (r14)
    "replicated_cursor_sync_audit",
}

# Queries the sweeps DO plan and audit, but whose construction legitimately
# runs a bounded number of Spark jobs even under SPARK_GRAFT_PLAN_ONLY —
# enumerated so the zero-jobs assertions (tests/test_scan_audit.py,
# tests/test_broadcast_audit.py) can fail on any NEW construction-time
# execution while tolerating these. Two classes, reasons per entry:
#   control-plane collect — a bounded model/state frame must exist as a
#     DRIVER object to build downstream expressions (a PQ codebook's
#     literal LUTs, an ack-range list); laziness is structurally impossible.
#   fixture build — the operator under test IS a side-effecting
#     source/sink; constructing it exercises the real topic/JDBC machinery.
CONSTRUCTION_JOBS_OK: dict[str, str] = {
    "pq_adc_ann_topk": "control-plane collect: 256 x M codebook rows "
    "become literal ADC lookup tables in the plan",
    "opq_rotated_adc_topk": "control-plane collect: codebook + rotation "
    "matrix rows become plan literals",
    "ivfadc_ann_topk": "control-plane collect: codebook rows -> ADC LUT "
    "literals (plus the 16-row IVF cell frame)",
    "ivfpq_residual_topk": "control-plane collect: residual codebook rows "
    "-> per-(query, cell) ADC LUT literals",
    "ivf_ann_topk": "control-plane training: MLlib KMeans fits the coarse "
    "quantizer at build time — the model IS driver-side state",
    "ack_holes_redelivery": "control-plane collect: the individually-acked "
    "range list (O(#ranges), cursor metadata) drives the redelivery filter",
    "jdbc_roundtrip": "fixture build: writes the embedded-Derby table the "
    "query then reads back — the JDBC sink is the operator under test",
    "tiered_shadow_roundtrip": "fixture build: creates/offloads/reads a "
    "real tiered topic — the offload machinery is the operator under test",
}


def flip_audit(spark, registry, sf: str, only=(), jobs_out: dict | None = None):
    """Plan every batch query with the broadcast threshold FLOORED (-1,
    simulating 100TB-scale size estimates) and report fact-backed
    broadcasts that survive: only explicit broadcast()/hint sites can.
    Survivors are then judged by the rich boundedness classifier —
    an explicit broadcast of a limit-bounded / one-row / bounded-domain
    build (per-lang stats, per-event_type thresholds) is CORRECT at any
    scale and not reported. What remains pins the class-(b) safety
    argument — 'rides reliable estimates, flips to shuffle as data
    grows' — for every estimate-driven site at once, and enumerates the
    explicit unbounded measurement forms for the allowlist.

    Plan-only: queries in CONSTRUCTION_EXECUTES are skipped (their fn()
    runs jobs at build time); SPARK_GRAFT_ESD_NO_PROBE disables the
    exact_substring mega-bucket census probe; and SPARK_GRAFT_PLAN_ONLY
    keeps control-plane materializations lazy (the IVF centroid frame
    collects 16 rows at construction in the product form — under the
    sweep it stays the lazy Limit-bounded subtree, which is exactly the
    plan shape the boundedness classifier should judge)."""
    import os

    out = {}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    os.environ["SPARK_GRAFT_ESD_NO_PROBE"] = "1"
    os.environ["SPARK_GRAFT_PLAN_ONLY"] = "1"
    # Plans cached by EARLIER constructions in this session were compiled
    # under the NORMAL threshold — their estimate-driven BroadcastExchanges
    # would be spliced verbatim into the flipped plans and read as
    # "surviving the floor" (r13: phrase_search_postings false-flagged
    # whenever the scan sweep had registered its persisted frame first).
    # Clearing the cache makes every build re-plan under the floored
    # threshold, which is the condition the audit exists to test.
    spark.catalog.clearCache()
    try:
        for name, q in sorted(registry.items()):
            if only and name not in only:
                continue
            if name.startswith("streaming_") or name in CONSTRUCTION_EXECUTES:
                continue
            if jobs_out is not None:
                from tools.scan_audit import exec_jobs_after, max_job_id

                mark = max_job_id(spark)
            plan = None
            try:
                df = q.fn(spark, sf)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # noqa: BLE001
                out[name] = [("SKIP", f"{type(e).__name__}: {str(e)[:80]}")]
            finally:
                if jobs_out is not None:
                    ran = exec_jobs_after(spark, mark)
                    if ran:
                        jobs_out[name] = ran
            if plan is None:
                continue
            hits = audit_plan_rich(plan, query=name)
            if hits:
                out[name] = hits
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        os.environ.pop("SPARK_GRAFT_ESD_NO_PROBE", None)
        os.environ.pop("SPARK_GRAFT_PLAN_ONLY", None)
    return out


def main():
    from pulsar_3_2_codedump_spark.queries import load_all
    from pulsar_3_2_codedump_spark.session import get_spark

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:]
    spark = get_spark("broadcast_audit")
    registry = load_all()
    if "--flip" in sys.argv:
        flagged = flip_audit(spark, registry, sf, only)
        for name, hits in flagged.items():
            for h in hits:
                print(f"FLIP-FLAG {name}: {h}")
        print(f"\n{len(flagged)} queries keep fact broadcasts at floored threshold")
        return
    n_flagged = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            continue  # streaming plans are per-microbatch; batch cores audited via their batch twins
        try:
            df = q.fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {type(e).__name__}: {str(e)[:80]}")
            continue
        hits = (
            audit_plan_rich(plan, query=name)
            if "--rich" in sys.argv
            else audit_plan(plan)
        )
        if hits:
            n_flagged += 1
            for h in hits:
                print(f"FLAG {name}: {h}")
    print(f"\n{n_flagged} queries flagged")


# Key domains that stay METADATA-SCALE at any corpus size: enumerable
# attributes (language, source, event type, partition, producer, label),
# calendar units, fixed fold/band/shard counts. A broadcast whose
# build's size-determining aggregate groups ONLY by these is bounded by
# the domain, not the corpus. Everything else (words, shingles, ngrams,
# doc/user/item ids) grows with the data. ADVICE r11: the generic names
# that a corpus-proportional key could plausibly wear (bucket, grp,
# window, rn, single letters) are REMOVED from the global set — e.g. an
# ESD-style 'bucket' is a substr(suffix) key that grows with the corpus;
# a query whose genuinely-bounded key happens to use such a name
# qualifies it per-query in QUERY_BOUNDED_KEYS instead.
BOUNDED_KEYS = {
    "lang", "source", "source_a", "source_b", "event_type", "type_a",
    "type_b", "partition", "producer_name", "producer", "label",
    "neighbor_label", "fold", "band", "shard", "__b", "__rb",
    "__db", "day", "hour", "week", "month", "event_day",
    "gen", "tier", "w_start", "w_end", "code", "sub",
    "cell", "cid", "centroid_id", "step", "rank",
    "replicate", "__r",  # fixed resample/sketch-row counts
    "l_returnflag", "l_linestatus", "l_shipmode", "o_orderpriority",
    "o_orderstatus", "n_name", "r_name", "c_mktsegment", "p_brand",
    "p_type", "p_size", "p_container", "subscription", "consumer",
    "state", "alarm", "reason", "marker_type", "schema_version",
}

# Per-query qualification of generic key names (ADVICE r11: match on
# (query, key) pairs rather than growing the global set). Each entry
# states why THAT query's use of the name is domain-bounded.
QUERY_BOUNDED_KEYS: dict[str, set[str]] = {
    # CMS table: i = sketch depth row (CMS_DEPTH), bucket = counter index
    # (fixed width) — the sketch is CMS_DEPTH x width cells at any corpus
    "count_min_heavy_hitters": {"bucket", "i"},
    # prefixops range-bucket partials: bucket = md5 % SHARD_BUCKETS /
    # fixed range-bucket count — the partial frame is #buckets rows
    "token_balanced_shards": {"bucket"},
    "watermark_late_data": {"bucket"},
    # cached PQ codebook lineage: m = subspace (PQ_M=16), code_id =
    # codeword (PQ_K=16) — the trained codebook is PQ_M x PQ_K rows
    "ivfadc_ann_topk": {"m", "code_id"},
    "ivfpq_residual_topk": {"m", "code_id"},
    # per-replicate prefix partials: bucket = range_bucket(32) — the
    # partials frame is B x 32 rows ('replicate' is globally bounded)
    "bootstrap_median_replicates": {"bucket"},
    # basket items are p_brand values renamed: the frequent-item /
    # antecedent / consequent frames are aggregates keyed on the bounded
    # brand domain (~25 values at any corpus size). Visible to the r13
    # flip audit because the basket table's DISK_ONLY persist (lineage
    # kept) lets the classifier see the lineitem-derived build the old
    # executed localCheckpoint used to hide behind Scan ExistingRDD.
    "association_rules": {"item"},
    # bloom word table: word = bit-position DIV 32, positions < BLOOM_M_BITS
    # — the filter is m/32 rows at any corpus size (its cut_plan_only site
    # documents the same bound; visible only to the NO_CUT audit pass)
    "bloom_filter_semi_join": {"word"},
    # entry-strata targets: DISTINCT of (cell_id, target rank) where ranks
    # are the HNSW_ENTRIES per-cell strata — <= PQIVF_CELLS x HNSW_ENTRIES
    # rows by construction (cellstats explode), never corpus-proportional
    "hnsw_beam_search_recall": {"cell_id", "rnk"},
    # same entry-strata targets device as hnsw_beam_search_recall, plus the
    # #queries-row trajectory-stat frames keyed on the capped query set
    "nsw_long_link_search_recall": {"cell_id", "rnk", "query_id"},
}

_LIMIT_NODE = re.compile(
    r"\b(GlobalLimit|LocalLimit|CollectLimit|TakeOrderedAndProject"
    r"|WindowGroupLimit)\b"
)
_AGG_NODE = re.compile(
    r"(HashAggregate|ObjectHashAggregate|SortAggregate)\(keys=\[(?P<keys>[^\]]*)\]"
)


def _key_names(keys: str):
    return set(re.findall(r"(\w+)#\d+", keys)) or (
        {keys.strip()} if keys.strip() else set()
    )


# The ANN broadcast-queries contract (VERDICT r13 item 4, enforced in
# similarity._query_pred): a frame filtered by BOTH the stride modulus and
# the arithmetic id cap holds at most ANN_MAX_QUERIES rows at ANY corpus
# size — the one bounded-build form that is a Filter, not a Limit or a
# domain-keyed aggregate. Constants imported so the rule tracks the code.
def _capped_query_set(ln: str) -> bool:
    from pulsar_3_2_codedump_spark.functions.similarity import (
        QUERY_ID_CAP,
        QUERY_STRIDE,
    )

    return f"% {QUERY_STRIDE}) = 0" in ln and f" < {QUERY_ID_CAP}" in ln


def _classify(lines, i, end, bounded_keys):
    """(bounded, unbounded_keys) of the build subtree rooted at lines[i],
    judged RECURSIVELY per branch (ADVICE r11: a Limit in one child of a
    join must not mark a fact-proportional sibling bounded — each branch
    classifies on its own spine and a multi-child node takes the worst
    case):

    - Limit / TakeOrderedAndProject / WindowGroupLimit → bounded; stop.
    - aggregate with keys=[] → one-row build (distinct-expansion plans
      put keyed PARTIALS below a global agg — judging the rootmost node
      of the spine keeps them from false-flagging); stop.
    - aggregate whose key names are all domain-bounded → metadata-scale
      at any corpus size; stop. With corpus-capable keys the aggregate
      is still bounded when its INPUT is (output rows <= input rows, so
      an agg keyed by doc_id over a WindowGroupLimit-bounded pool stays
      bounded) — recurse, and flag the agg's keys only if a branch
      below is itself unbounded.
    - leaf → unbounded iff it scans a fact relation.
    - any other node → bounded iff ALL its children are bounded."""
    ln = lines[i]
    if _LIMIT_NODE.search(ln):
        return True, set()
    if _capped_query_set(ln):
        return True, set()  # ANN query set: <= ANN_MAX_QUERIES by contract
    m = _AGG_NODE.search(ln)
    if m:
        keys = _key_names(m.group("keys"))
        unb = {k for k in keys if k not in bounded_keys}
        if not unb:
            return True, set()
        kids = _children(lines, i, end)
        if kids:
            sub_end = kids[1:] + [end]
            if all(
                _classify(lines, j, e, bounded_keys)[0]
                for j, e in zip(kids, sub_end)
            ):
                return True, set()
        return False, unb
    kids = _children(lines, i, end)
    if not kids:
        fact = [t for t in FACTS if re.search(rf"\b{t}\b", ln)]
        return (not fact), ({"<fact-scan>"} if fact else set())
    sub_end = kids[1:] + [end]
    results = [
        _classify(lines, j, e, bounded_keys) for j, e in zip(kids, sub_end)
    ]
    unb = set().union(*(u for _, u in results))
    return all(b for b, _ in results), unb


def audit_plan_rich(plan: str, query: str | None = None):
    """Like audit_plan but classifies each fact-backed broadcast by the
    SIZE-DETERMINING nodes of its build tree via _classify (branch-aware:
    see its doc — a Limit only bounds the branch it sits on). A bounded
    build (limit-class spine, one-row aggregate, or aggregates over
    domain-bounded keys on every branch) is excluded; anything else is a
    genuine class-(b) flag: a corpus-derived build riding size estimates
    that flip past the broadcast threshold as the data grows.
    Returns (fact_tables, sorted_unbounded_keys, root_line) per flag."""
    lines = plan.splitlines()
    bounded_keys = BOUNDED_KEYS | QUERY_BOUNDED_KEYS.get(query or "", set())
    hits = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        sub = subtree(lines, i)
        text = "\n".join(sub)
        fact = [t for t in FACTS if re.search(rf"\b{t}\b", text)]
        if not fact:
            continue
        end = i + len(sub)
        kids = _children(lines, i, end)
        if not kids:
            hits.append((fact, ["<no-aggregate>"], ""))
            continue
        sub_end = kids[1:] + [end]
        results = [
            _classify(lines, j, e, bounded_keys)
            for j, e in zip(kids, sub_end)
        ]
        if all(b for b, _ in results):
            continue
        unbounded = sorted(set().union(*(u for _, u in results)))
        root = sub[1].strip() if len(sub) > 1 else ""
        hits.append((fact, unbounded or ["<no-aggregate>"], root[:90]))
    return hits


if __name__ == "__main__":
    main()
