"""Synthetic molecular corpus (ZINC HDF5 schema) with a structural regression target.

Purpose: real-scale convergence evidence (VERDICT round 1, item 2). The medium-scale
benchmark tarball (zenodo 5500978, `download_medium_scale_datasets.sh`) is not
downloadable in this environment, so this generator produces a ZINC-format corpus
whose target genuinely requires graph structure — not a node-count readout:

    y =   w1 * mean over edges of T[token_u, token_v]   (1-hop token interactions)
        + w2 * mean shortest-path length                (multi-hop global structure)
        + w3 * triangle density                         (local clustering)
        + w4 * mean over edges of B[edge_token]         (edge-feature effect)

All components are deterministic functions of the graph, so a strong model can push
MAE far below the target's std (~0.5), mirroring ZINC's constrained-solubility
regression. Graphs are molecular-like: sparse (tree + extra chords), degree <= 4,
9..37 nodes, 28 node-token / 4 edge-token vocabularies — the real ZINC sizes
(`/root/reference/lib/data/datasets/zinc.py:50`, vocab per the dataset notebook).

The same HDF5 file is consumed byte-identically by this framework's pipeline and by
the TF reference stack (same on-disk schema).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import shortest_path

from egt_tpu.data.hdf5_io import write_records

NODE_VOCAB = 28
EDGE_VOCAB = 4


def _molecular_graph(rng, n_min=9, n_max=37, max_degree=4):
    """Random connected sparse graph: a random tree plus chord edges, degree-capped."""
    n = int(rng.integers(n_min, n_max + 1))
    deg = np.zeros(n, np.int64)
    edges = []
    for v in range(1, n):
        # attach to a random earlier node with spare degree
        cands = np.flatnonzero(deg[:v] < max_degree)
        u = int(rng.choice(cands)) if len(cands) else int(rng.integers(0, v))
        edges.append((u, v))
        deg[u] += 1
        deg[v] += 1
    # chords: up to ~30% extra edges (rings)
    n_extra = int(rng.integers(0, max(2, n // 3)))
    have = set(edges)
    for _ in range(n_extra):
        u, v = rng.integers(0, n, size=2)
        u, v = int(min(u, v)), int(max(u, v))
        if u == v or (u, v) in have or deg[u] >= max_degree or deg[v] >= max_degree:
            continue
        edges.append((u, v))
        have.add((u, v))
        deg[u] += 1
        deg[v] += 1
    e = np.array(edges, np.int64)
    # both directions, as the benchmark datasets store them
    e = np.concatenate([e, e[:, ::-1]], axis=0)
    return n, e, deg


def _target(n, edges_undir, nodef, edgef, T, B):
    u, v = edges_undir[:, 0], edges_undir[:, 1]
    t_edge = float(T[nodef[u], nodef[v]].mean())
    t_efeat = float(B[edgef].mean())
    adj = csr_matrix((np.ones(len(u)), (u, v)), shape=(n, n))
    adj = adj + adj.T
    sp = shortest_path(adj, method="D", unweighted=True)
    t_sp = float(sp[np.isfinite(sp)].mean())
    a = (adj > 0).astype(np.int64).toarray()
    tri = np.trace(a @ a @ a) / 6.0
    t_tri = float(tri) / n
    return 1.0 * t_edge + 0.25 * t_sp + 1.0 * t_tri + 0.5 * t_efeat


def make_corpus(path, n_train, n_valid, n_test, seed=0, name="ZINC"):
    rng = np.random.default_rng(seed)
    # fixed interaction tables (seeded independently of the graph stream)
    trng = np.random.default_rng(12345)
    T = trng.normal(0, 0.5, size=(NODE_VOCAB, NODE_VOCAB))
    T = (T + T.T) / 2.0
    B = trng.normal(0, 0.5, size=(EDGE_VOCAB,))
    counts = {"training": n_train, "validation": n_valid, "test": n_test}
    stats = []
    for si, (split, cnt) in enumerate(counts.items()):
        records = []
        for _ in range(cnt):
            n, edges, deg = _molecular_graph(rng)
            # node tokens correlated with degree (like atom types with valence)
            nodef = ((deg * 7 + rng.integers(0, 7, size=n)) % NODE_VOCAB
                     ).astype(np.int64)
            edgef = rng.integers(0, EDGE_VOCAB, size=len(edges) // 2)
            edgef = np.concatenate([edgef, edgef]).astype(np.int64)  # symmetric
            y = _target(n, edges[: len(edges) // 2], nodef, edgef, T, B)
            stats.append(y)
            records.append(dict(num_nodes=n, edges=edges, node_features=nodef,
                                edge_features=edgef,
                                value=np.array([y], np.float32)))
        write_records(path, name, split, records,
                      meta={"max_nodes": 37} if si == 0 else None)
    s = np.asarray(stats)
    return {"n": len(s), "target_mean": float(s.mean()),
            "target_std": float(s.std())}


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--train", type=int, default=10000)
    ap.add_argument("--valid", type=int, default=1000)
    ap.add_argument("--test", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    info = make_corpus(args.path, args.train, args.valid, args.test, args.seed)
    print(json.dumps(info))
