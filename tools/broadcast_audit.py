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


def subtree(lines, i):
    """Lines of the subtree rooted at lines[i] (tree-prefix indentation)."""

    def depth(s):
        m = re.match(r"^[\s:+|-]*", s)
        return len(m.group(0))

    d = depth(lines[i])
    out = [lines[i]]
    for j in range(i + 1, len(lines)):
        if lines[j].strip() == "":
            break
        if depth(lines[j]) <= d:
            break
        out.append(lines[j])
    return out


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


def flip_audit(spark, registry, sf: str, only=()):
    """Plan every batch query with the broadcast threshold FLOORED (-1,
    simulating 100TB-scale size estimates) and report fact-backed
    broadcasts that survive: only explicit broadcast()/hint sites can.
    Survivors are then judged by the rich boundedness classifier —
    an explicit broadcast of a limit-bounded / one-row / bounded-domain
    build (per-lang stats, per-event_type thresholds) is CORRECT at any
    scale and not reported. What remains pins the class-(b) safety
    argument — 'rides reliable estimates, flips to shuffle as data
    grows' — for every estimate-driven site at once, and enumerates the
    explicit unbounded measurement forms for the allowlist."""
    out = {}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, q in sorted(registry.items()):
            if only and name not in only:
                continue
            if name.startswith("streaming_"):
                continue
            try:
                df = q.fn(spark, sf)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:  # noqa: BLE001
                out[name] = [("SKIP", f"{type(e).__name__}: {str(e)[:80]}")]
                continue
            hits = audit_plan_rich(plan)
            if hits:
                out[name] = hits
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
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
        fn = audit_plan_rich if "--rich" in sys.argv else audit_plan
        hits = fn(plan)
        if hits:
            n_flagged += 1
            for h in hits:
                print(f"FLAG {name}: {h}")
    print(f"\n{n_flagged} queries flagged")


# Key domains that stay METADATA-SCALE at any corpus size: enumerable
# attributes (language, source, event type, partition, producer, label),
# calendar units, fixed bucket/fold/band/shard counts. A broadcast whose
# build's size-determining aggregate groups ONLY by these is bounded by
# the domain, not the corpus. Everything else (words, shingles, ngrams,
# doc/user/item ids) grows with the data.
BOUNDED_KEYS = {
    "lang", "source", "source_a", "source_b", "event_type", "type_a",
    "type_b", "partition", "producer_name", "producer", "label",
    "neighbor_label", "fold", "band", "bucket", "shard", "__b", "__rb",
    "__db", "day", "d", "h", "hour", "week", "month", "event_day",
    "gen", "grp", "tier", "window", "w_start", "w_end", "code", "sub",
    "m", "cell", "cid", "centroid_id", "k", "step", "rn", "rank",
    "replicate", "__r", "i",  # fixed resample/sketch-row counts
    "l_returnflag", "l_linestatus", "l_shipmode", "o_orderpriority",
    "o_orderstatus", "n_name", "r_name", "c_mktsegment", "p_brand",
    "p_type", "p_size", "p_container", "subscription", "consumer",
    "state", "alarm", "reason", "marker_type", "schema_version",
}

_SIZE_NODE = re.compile(
    r"\b(GlobalLimit|LocalLimit|CollectLimit|TakeOrderedAndProject"
    r"|WindowGroupLimit)\b"
    r"|(HashAggregate|ObjectHashAggregate|SortAggregate)\(keys=\[(?P<keys>[^\]]*)\]"
)


def _key_names(keys: str):
    return set(re.findall(r"(\w+)#\d+", keys)) or (
        {keys.strip()} if keys.strip() else set()
    )


def audit_plan_rich(plan: str):
    """Like audit_plan but classifies each fact-backed broadcast by its
    SIZE-DETERMINING root node — the first Limit-class or aggregate
    operator under the exchange (line order is root-to-leaf):

    - Limit / TakeOrderedAndProject / WindowGroupLimit → bounded by
      construction (the inner partials below it no longer matter);
    - root aggregate with keys=[] → one-row build (distinct-expansion
      plans put keyed PARTIALS below a global agg — the build is still
      one row, so judge the root only);
    - root aggregate whose key names are all in BOUNDED_KEYS → the build
      is metadata-scale at any corpus size;
    - anything else → a genuine class-(b) flag: a corpus-derived build
      riding size estimates that flip past the broadcast threshold as
      the data grows.
    Returns (fact_tables, sorted_unbounded_keys, root_line) per flag."""
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
        root_keys = None
        for s in sub[1:]:  # top-down: first size-determining node is rootmost
            m = _SIZE_NODE.search(s)
            if not m:
                continue
            if m.group(1):  # Limit-class node
                root_keys = set()
                break
            root_keys = _key_names(m.group("keys"))
            break
        if root_keys is None:
            # no limit and no aggregate under the exchange: a raw
            # fact-proportional frame — always a flag
            hits.append((fact, ["<no-aggregate>"], sub[1].strip()[:90] if len(sub) > 1 else ""))
            continue
        unbounded = sorted(k for k in root_keys if k not in BOUNDED_KEYS)
        if not unbounded:
            continue
        root = sub[1].strip() if len(sub) > 1 else ""
        hits.append((fact, unbounded, root[:90]))
    return hits


if __name__ == "__main__":
    main()
