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
        if re.search(r"\b(Global|Local|Collect)?Limit\b|WindowGroupLimit", text):
            continue  # bounded by construction
        # scalar (global) aggregate: HashAggregate(keys=[], ...)
        if re.search(r"HashAggregate\(keys=\[\]", text) and not re.search(
            r"HashAggregate\(keys=\[[^\]]", text
        ):
            continue
        hits.append((fact, sub[0].strip()[:100]))
    return hits


def main():
    from pulsar_3_2_codedump_spark.queries import load_all
    from pulsar_3_2_codedump_spark.session import get_spark

    argv = [a for a in sys.argv[1:] if a != "--rich"]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:]
    spark = get_spark("broadcast_audit")
    registry = load_all()
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


def audit_plan_rich(plan: str):
    """Like audit_plan but only flags ESTIMATE-UNRELIABLE builds (the build
    subtree contains a keyed aggregate / distinct-producing agg over the
    fact scan) and reports the aggregate keys so boundedness can be judged:
    a group-by over a bounded domain (source, event_type, producer, day,
    band id) stays metadata-scale at any corpus size; words / ngrams /
    doc_ids / user-level keys grow with the data."""
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
        if re.search(r"\b(Global|Local|Collect)?Limit\b|WindowGroupLimit", text):
            continue
        keyed = re.findall(r"HashAggregate\(keys=\[([^\]]+)\]", text)
        keyed = [k for k in keyed if k.strip()]
        if not keyed:
            continue  # scalar/identity broadcast of a one-row aggregate
        root = sub[1].strip() if len(sub) > 1 else ""
        hits.append((fact, sorted(set(k.split(",")[0].split("#")[0].strip() for k in keyed)), root[:90]))
    return hits


if __name__ == "__main__":
    main()
