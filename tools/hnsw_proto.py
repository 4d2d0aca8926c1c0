"""Numpy mirror of the deterministic HNSW-over-IVF search — constant-tuning
harness for the layered (hierarchical) variant, VERDICT r14 item 3.

Mirrors similarity.py's exact deterministic pipeline (md5-sampled cells,
rank-band-seeded NN-descent digraph, unrolled beam hops with (cos desc,
vec_id asc) tiebreaks) in plain numpy so recall/constant sweeps run in
seconds instead of Spark minutes. NOT part of the engine — tooling only.

Usage: python tools/hnsw_proto.py [sf_dir]
"""
from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np

QUERY_STRIDE = 50
ANN_MAX_QUERIES = 4096
QUERY_ID_CAP = QUERY_STRIDE * ANN_MAX_QUERIES
PQIVF_CELLS = 8


def load(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, X


def md5_cells(ids):
    keyed = sorted(ids, key=lambda v: (hashlib.md5(f"cell:{v}".encode()).hexdigest(), v))
    return np.array(keyed[:PQIVF_CELLS], dtype=np.int64)  # cell_id order = rank order


def sqdist(a, b):
    d = a - b
    return (d * d).sum(axis=-1)


def build_graph(ids, X, cell_of, members_by_cell, cents, M, seed_w, rounds_n, pos=None):
    """NN-descent digraph per cell: rank-band seed + synchronous rounds.

    ``pos`` maps vec_id -> row of X; REQUIRED when ids is a subset of X's
    rows (the r15 layered sweep originally rebuilt pos from the subset ids
    and silently indexed the wrong X rows — the 'layer-1 graph' it measured
    was effectively random long links)."""
    nbrs: dict[int, list[int]] = {}
    rank_order: dict[int, list[int]] = {}
    if pos is None:
        pos = {v: i for i, v in enumerate(ids)}
    for c, mem in members_by_cell.items():
        cd = sqdist(X[[pos[v] for v in mem]], cents[c])
        order = [v for _, v in sorted(zip(cd, mem))]
        rank_order[c] = order
        rnk = {v: i + 1 for i, v in enumerate(order)}
        for v in mem:
            r = rnk[v]
            cand = [u for u in mem if u != v and abs(rnk[u] - r) <= seed_w]
            d = sqdist(X[[pos[u] for u in cand]], X[pos[v]])
            top = [u for _, u in sorted(zip(d, cand))][:M]
            nbrs[v] = top
    for _ in range(rounds_n):
        rev: dict[int, set[int]] = {v: set() for v in nbrs}
        for v, ns in nbrs.items():
            for u in ns:
                rev[u].add(v)
        new = {}
        for v, ns in nbrs.items():
            cand = set(ns) | rev[v]
            for u in ns:
                cand |= set(nbrs[u])
            cand.discard(v)
            cand = sorted(cand)
            d = sqdist(X[[pos[u] for u in cand]], X[pos[v]])
            new[v] = [u for _, u in sorted(zip(d, cand))][:M]
        nbrs = new
    return nbrs, rank_order


def cos_rank(qx, cand_ids, X, pos, keep):
    """Re-rank cand_ids by (cosine desc, vec_id asc), keep top `keep`."""
    cand_ids = sorted(set(cand_ids))
    C = X[[pos[u] for u in cand_ids]]
    cs = (C @ qx) / (np.linalg.norm(C, axis=1) * np.linalg.norm(qx))
    order = sorted(zip(-cs, cand_ids))
    return [u for _, u in order[:keep]]


def search(qid, qx, entries, nbrs, X, pos, ef, hops, k):
    # matches the registered recurrence: the INITIAL beam is the full entry
    # set (no pre-truncation); each hop expands then re-ranks to EF
    beam = [e for e in entries if e != qid]
    for _ in range(hops):
        frontier = set(beam)
        for v in beam:
            frontier |= set(nbrs.get(v, []))
        frontier.discard(qid)
        beam = cos_rank(qx, frontier, X, pos, ef)
    return cos_rank(qx, beam, X, pos, k)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ids, X = load(sf_dir)
    pos = {v: i for i, v in enumerate(ids)}
    cell_ids = md5_cells(ids)
    cents = {c + 1: X[pos[v]] for c, v in enumerate(cell_ids)}
    # assign: nearest cell, (sqd, cell_id) tiebreak
    cell_of = {}
    members: dict[int, list[int]] = {c: [] for c in cents}
    for v in ids:
        d = [(sqdist(X[pos[v]], cents[c]), c) for c in sorted(cents)]
        c = min(d)[1]
        cell_of[v] = c
        members[c].append(v)

    queries = [v for v in ids if v % QUERY_STRIDE == 0 and v < QUERY_ID_CAP]
    # exact top-k (excluding self) and per-query probe cells
    K = 3

    def probes(qx, n):
        d = sorted((sqdist(qx, cents[c]), c) for c in sorted(cents))
        return [c for _, c in d[:n]]

    exact = {}
    for q in queries:
        exact[q] = set(cos_rank(X[pos[q]], [v for v in ids if v != q], X, pos, K))

    def ceiling(nprobe):
        tot = 0
        for q in queries:
            pc = set(probes(X[pos[q]], nprobe))
            tot += sum(1 for v in exact[q] if cell_of[v] in pc)
        return tot / (K * len(queries))

    for np_ in (2, 3, 4, 5):
        print(f"nprobe={np_} cell ceiling: {ceiling(np_):.4f}")

    # ---- flat baseline (current registered constants) ----
    M, SEED_W, ND = 8, 8, 2
    nbrs, rank_order = build_graph(ids, X, cell_of, members, cents, M, SEED_W, ND)

    def flat(entries_n, ef, hops, nprobe):
        tot = 0
        for q in queries:
            ents = []
            for c in probes(X[pos[q]], nprobe):
                order = rank_order[c]
                csz = len(order)
                for i in range(entries_n):
                    ents.append(order[(i * csz) // entries_n])  # rnk = 1 + i*csz//E
            got = search(q, X[pos[q]], ents, nbrs, X, pos, ef, hops, K)
            tot += len(set(got) & exact[q])
        return tot / (K * len(queries))

    print(f"flat E=8 EF=16 hops=4 nprobe=3 (registered): {flat(8, 16, 4, 3):.4f}")
    for ef in (24, 32, 48, 64):
        for h in (4, 5):
            print(f"flat E=8 EF={ef} hops={h} nprobe=3: {flat(8, ef, h, 3):.4f}")
    print(f"flat E=8 EF=32 hops=4 nprobe=4: {flat(8, 32, 4, 4):.4f}")
    print(f"flat E=8 EF=32 hops=4 nprobe=5: {flat(8, 32, 4, 5):.4f}")

    # ---- layered variants ----
    def layered(l1_stride, ef1, hops1, ef0, hops0, nprobe, entries_n):
        # layer-1 node set: rank within cell, (rnk-1) % stride == 0
        l1_members = {
            c: [v for i, v in enumerate(rank_order[c]) if i % l1_stride == 0]
            for c in members
        }
        l1_ids = sorted(v for mem in l1_members.values() for v in mem)
        nbrs1, rank1 = build_graph(
            np.array(l1_ids), X, cell_of, l1_members, cents, M, SEED_W, ND
        )
        tot = 0
        for q in queries:
            qx = X[pos[q]]
            pc = probes(qx, nprobe)
            l1_entries = [rank1[c][0] for c in pc]  # layer-1 medoid per probed cell
            b1 = search(q, qx, l1_entries, nbrs1, X, pos, ef1, hops1, entries_n)
            got = search(q, qx, b1, nbrs, X, pos, ef0, hops0, K)
            tot += len(set(got) & exact[q])
        return tot / (K * len(queries))

    # ---- merged-edge hierarchy: walk edges0 u edges1 (layer-1 edges are
    # longer-range because they're built over a sparser subset — the
    # navigable-small-world long links of Malkov's NSW, expressed flat) ----
    def merged(l1_stride, ef, hops, nprobe, entries_n, descend=False, ef1=16, h1=3):
        l1_members = {
            c: [v for i, v in enumerate(rank_order[c]) if i % l1_stride == 0]
            for c in members
        }
        l1_ids = sorted(v for mem in l1_members.values() for v in mem)
        nbrs1, rank1 = build_graph(
            np.array(l1_ids), X, cell_of, l1_members, cents, M, SEED_W, ND
        )
        mnbrs = {v: list(ns) for v, ns in nbrs.items()}
        for v, ns in nbrs1.items():
            mnbrs[v] = sorted(set(mnbrs[v]) | set(ns))
        tot = 0
        for q in queries:
            qx = X[pos[q]]
            pc = probes(qx, nprobe)
            if descend:
                l1_entries = [rank1[c][0] for c in pc]
                ents = search(q, qx, l1_entries, nbrs1, X, pos, ef1, h1, entries_n)
            else:
                ents = []
                for c in pc:
                    order = rank_order[c]
                    csz = len(order)
                    for i in range(entries_n):
                        ents.append(order[(i * csz) // entries_n])
            got = search(q, qx, ents, mnbrs, X, pos, ef, hops, K)
            tot += len(set(got) & exact[q])
        return tot / (K * len(queries))

    for stride in (2, 4, 8):
        for ef in (16, 32, 48, 64):
            r = merged(stride, ef, 4, 3, 8)
            print(f"merged stride={stride} EF={ef} hops=4 spread-entries nprobe=3: {r:.4f}")
    for stride in (2, 4, 8):
        for ef in (32, 64):
            r = merged(stride, ef, 4, 3, 8, descend=True)
            print(f"merged+descend stride={stride} EF={ef} hops=4 nprobe=3: {r:.4f}")

    # descend fine-tune + union-entries variant (l1 beam entries PLUS the
    # spread strata entries — near-query focus with basin diversity)
    def merged_union(l1_stride, ef, hops, nprobe, l1_n, spread_n, ef1, h1):
        l1_members = {
            c: [v for i, v in enumerate(rank_order[c]) if i % l1_stride == 0]
            for c in members
        }
        l1_ids = sorted(v for mem in l1_members.values() for v in mem)
        nbrs1, rank1 = build_graph(
            np.array(l1_ids), X, cell_of, l1_members, cents, M, SEED_W, ND
        )
        mnbrs = {v: list(ns) for v, ns in nbrs.items()}
        for v, ns in nbrs1.items():
            mnbrs[v] = sorted(set(mnbrs[v]) | set(ns))
        tot = 0
        for q in queries:
            qx = X[pos[q]]
            pc = probes(qx, nprobe)
            l1_entries = [rank1[c][0] for c in pc]
            ents = search(q, qx, l1_entries, nbrs1, X, pos, ef1, h1, l1_n)
            for c in pc:
                order = rank_order[c]
                csz = len(order)
                for i in range(spread_n):
                    ents.append(order[(i * csz) // spread_n])
            got = search(q, qx, ents, mnbrs, X, pos, ef, hops, K)
            tot += len(set(got) & exact[q])
        return tot / (K * len(queries))

    for ef1, l1n in ((16, 8), (32, 16), (32, 8)):
        for ef in (48, 64):
            for h in (4, 5):
                r = merged_union(2, ef, h, 3, l1n, 0, ef1, 3)
                print(f"descend stride=2 EF1={ef1} l1n={l1n} EF={ef} hops={h}: {r:.4f}")
    for ef in (48, 64):
        r = merged_union(2, ef, 4, 3, 8, 8, 16, 3)
        print(f"union stride=2 l1n=8 spread=8 EF={ef} hops=4: {r:.4f}")
        r = merged_union(2, ef, 4, 3, 16, 8, 32, 3)
        print(f"union stride=2 l1n=16 spread=8 EF={ef} hops=4: {r:.4f}")


if __name__ == "__main__":
    main()
