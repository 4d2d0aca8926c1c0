"""r15 layered-HNSW sweep with the CORRECT layer-1 graph (pos fix) plus
deterministic long-link variants — tooling only, not part of the engine.

What the corrupted r15 sweep accidentally measured (wrong X rows for the
layer-1 build) was a graph of effectively RANDOM long links — and it beat
the flat search. The honest kNN-subsample hierarchy does not (0.3417 vs
0.5167 flat at sf0.1, confirmed by the oracle). This sweep measures the
principled version of the accident: md5-permutation ring links (NSW/
Watts-Strogatz long links, deterministic so both engines can build them),
per-cell and global.

Usage: python tools/hnsw_proto2.py [sf_dir]
"""
from __future__ import annotations

import hashlib
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")
import hnsw_proto as P


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ids, X = P.load(sf_dir)
    pos = {v: i for i, v in enumerate(ids)}
    cell_ids = P.md5_cells(ids)
    cents = {c + 1: X[pos[v]] for c, v in enumerate(cell_ids)}
    members: dict[int, list[int]] = {c: [] for c in cents}
    cell_of = {}
    for v in ids:
        c = min((P.sqdist(X[pos[v]], cents[c]), c) for c in sorted(cents))[1]
        cell_of[v] = c
        members[c].append(v)
    queries = [v for v in ids if v % P.QUERY_STRIDE == 0 and v < P.QUERY_ID_CAP]
    K = 3

    def probes(qx, n):
        d = sorted((P.sqdist(qx, cents[c]), c) for c in sorted(cents))
        return [c for _, c in d[:n]]

    exact = {
        q: set(P.cos_rank(X[pos[q]], [v for v in ids if v != q], X, pos, K))
        for q in queries
    }
    M, SEED_W, ND = 8, 8, 2
    nbrs, rank_order = P.build_graph(ids, X, cell_of, members, cents, M, SEED_W, ND)

    def spread_entries(q, nprobe, entries_n):
        ents = []
        for c in probes(X[pos[q]], nprobe):
            order = rank_order[c]
            csz = len(order)
            for i in range(entries_n):
                ents.append(order[(i * csz) // entries_n])
        return ents

    def run(graph, ef, hops, nprobe=3, entries_n=8):
        tot = 0
        for q in queries:
            ents = spread_entries(q, nprobe, entries_n)
            got = P.search(q, X[pos[q]], ents, graph, X, pos, ef, hops, K)
            tot += len(set(got) & exact[q])
        return tot / (K * len(queries))

    print(f"flat EF=64 hops=4: {run(nbrs, 64, 4):.4f}")

    # correct l1-kNN merged (validates the mirror against the oracle: the
    # registered layered query measures 0.3417 at sf0.1)
    def l1_knn_merged(stride):
        l1_members = {
            c: [v for i, v in enumerate(rank_order[c]) if i % stride == 0]
            for c in members
        }
        l1_ids = sorted(v for mem in l1_members.values() for v in mem)
        nbrs1, rank1 = P.build_graph(
            np.array(l1_ids), X, cell_of, l1_members, cents, M, SEED_W, ND, pos=pos
        )
        g = {v: list(ns) for v, ns in nbrs.items()}
        for v, ns in nbrs1.items():
            g[v] = sorted(set(g[v]) | set(ns))
        return g, nbrs1, rank1

    def descend_run(stride, ef1, h1, l1n, ef, hops, nprobe=3):
        g, nbrs1, rank1 = l1_knn_merged(stride)
        tot = 0
        for q in queries:
            qx = X[pos[q]]
            pc = probes(qx, nprobe)
            l1_entries = [rank1[c][0] for c in pc]
            ents = P.search(q, qx, l1_entries, nbrs1, X, pos, ef1, h1, l1n)
            got = P.search(q, qx, ents, g, X, pos, ef, hops, K)
            tot += len(set(got) & exact[q])
        return tot / (K * len(queries))

    print(f"l1-kNN descend stride=2 (registered shape): {descend_run(2, 32, 3, 8, 64, 4):.4f}")

    # md5-ring long links: order nodes by md5('ll:'+vec_id), each node ->
    # next LL_K ring successors; per-cell or global
    def ring_links(node_ids, ll_k):
        order = sorted(node_ids, key=lambda v: (hashlib.md5(f"ll:{v}".encode()).hexdigest(), v))
        n = len(order)
        out = {}
        for i, v in enumerate(order):
            out[v] = [order[(i + j) % n] for j in range(1, ll_k + 1) if order[(i + j) % n] != v]
        return out

    def merged_with(extra):
        g = {v: list(ns) for v, ns in nbrs.items()}
        for v, ns in extra.items():
            g[v] = sorted(set(g[v]) | set(ns))
        return g

    for scope in ("cell", "global"):
        for ll_k in (2, 4, 8):
            if scope == "cell":
                extra: dict[int, list[int]] = {}
                for c, mem in members.items():
                    extra.update(ring_links(mem, ll_k))
            else:
                extra = ring_links(list(ids), ll_k)
            g = merged_with(extra)
            for ef in (32, 64):
                r = run(g, ef, 4)
                print(f"ring scope={scope} ll_k={ll_k} EF={ef} hops=4: {r:.4f}")
    # global ring with more hops (long links need hops to pay off)
    extra = ring_links(list(ids), 4)
    g = merged_with(extra)
    for hops in (4, 5, 6):
        print(f"ring global ll_k=4 EF=64 hops={hops}: {run(g, 64, hops):.4f}")


if __name__ == "__main__":
    main()
