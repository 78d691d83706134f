"""Synthetic TSP corpus (TSP HDF5 schema) with a tour-edge classification target.

Purpose: convergence evidence for the edge-classification task family
(VERDICT round 2, item 5) — the real TSP corpus (zenodo 5500978) is not
downloadable here. Mirrors the task *semantics* of the benchmark TSP dataset
(`/root/reference/lib/data/datasets/tsp.py`: 2-d float node coordinates,
k-NN graph with euclidean-distance edge features, per-edge binary labels for
edges on the tour):

  - nodes: uniform points in [0,1]^2,
  - edges: symmetrized k-nearest-neighbour graph (k=8),
  - tour: greedy nearest-neighbour tour from node 0 (a deterministic function
    of the coordinates, so the task is learnable to high F1),
  - edge_labels[e] = 1 iff edge e connects consecutive tour nodes.

Graph sizes are kept small (20-40 nodes vs the benchmark's 50-499) so the TF
reference arm is feasible on this host's single CPU core; the task family
(sparse xent over the N x N edge-label matrix, P/R/F1 eval over valid edges)
is exercised identically.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from egt_tpu.data.hdf5_io import write_records


def _tsp_graph(rng, k=8):
    n = int(rng.integers(20, 41))
    pts = rng.random((n, 2))
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    # symmetrized k-NN edge set (upper-triangular canonical form)
    nn = np.argsort(d, axis=1)[:, :k]
    pairs = set()
    for u in range(n):
        for v in nn[u]:
            pairs.add((min(u, int(v)), max(u, int(v))))
    # greedy nearest-neighbour tour from node 0
    visited = np.zeros(n, bool)
    visited[0] = True
    tour = [0]
    for _ in range(n - 1):
        dd = d[tour[-1]].copy()
        dd[visited] = np.inf
        nxt = int(dd.argmin())
        tour.append(nxt)
        visited[nxt] = True
    tour_pairs = set()
    for a, b in zip(tour, tour[1:] + tour[:1]):
        tour_pairs.add((min(a, b), max(a, b)))
    pairs |= tour_pairs  # ensure every tour edge exists in the graph
    e_half = np.array(sorted(pairs), np.int64)
    lab_half = np.array([p in tour_pairs for p in sorted(pairs)], np.int64)
    feat_half = d[e_half[:, 0], e_half[:, 1]].astype(np.float32)[:, None]
    # both directions, as the benchmark datasets store them
    e = np.concatenate([e_half, e_half[:, ::-1]], axis=0)
    lab = np.concatenate([lab_half, lab_half])
    feat = np.concatenate([feat_half, feat_half], axis=0)
    return n, pts.astype(np.float32), e, feat, lab


def make_corpus(path, n_train, n_valid, n_test, seed=0, name="TSP"):
    rng = np.random.default_rng(seed)
    counts = {"training": n_train, "validation": n_valid, "test": n_test}
    pos = tot = 0
    for si, (split, cnt) in enumerate(counts.items()):
        records = []
        for _ in range(cnt):
            n, pts, edges, feat, lab = _tsp_graph(rng)
            pos += int(lab.sum())
            tot += len(lab)
            records.append(dict(num_nodes=n, edges=edges, node_features=pts,
                                edge_features=feat, edge_labels=lab))
        write_records(path, name, split, records,
                      meta={"max_nodes": 40} if si == 0 else None)
    return {"n": sum(counts.values()), "positive_edge_frac": pos / tot}


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
