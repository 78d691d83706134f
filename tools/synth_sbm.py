"""Synthetic SBM corpus (SBM_PATTERN HDF5 schema) with a planted-pattern
node-classification target.

Purpose: convergence evidence for the node-classification task family
(VERDICT round 2, item 5) — the real PATTERN corpus (zenodo 5500978) is not
downloadable here. Mirrors the task *semantics* of PATTERN
(`/root/reference/lib/data/datasets/sbm_pattern.py`: int node tokens vocab 3,
no edge features, per-node binary labels, class-imbalanced):

  - background: 2-community SBM graph,
  - planted pattern: a denser subgraph whose node tokens are drawn from a
    skewed distribution (structure + feature signal, like PATTERN's planted
    motif with its own feature signature),
  - label = 1 iff the node belongs to the pattern (~22% positives, close to
    PATTERN's 209900/1189120 = 17.7%).

Graph sizes are kept small (<= 33 nodes vs PATTERN's 44-188) so the TF
reference arm is feasible on this host's single CPU core; the task family
(weighted sparse xent over imbalanced node labels, SBM eval metrics) is
exercised identically.

The same HDF5 file is consumed byte-identically by this framework's pipeline
and by the TF reference stack.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from egt_tpu.data.hdf5_io import write_records

NODE_VOCAB = 3


def _sbm_pattern_graph(rng):
    n_bg = int(rng.integers(20, 27))
    p_sz = int(rng.integers(5, 8))
    n = n_bg + p_sz
    split = n_bg // 2  # community boundary within the background
    labels = np.zeros(n, np.int64)
    labels[n_bg:] = 1

    # node tokens: uniform for background, skewed for pattern nodes
    tokens = rng.integers(0, NODE_VOCAB, size=n)
    tokens[n_bg:] = rng.choice(NODE_VOCAB, size=p_sz, p=[0.15, 0.15, 0.7])

    # random upper-triangular edge draw with block probabilities
    probs = np.empty((n, n))
    comm = np.zeros(n, np.int64)
    comm[split:n_bg] = 1
    comm[n_bg:] = 2
    for a, b, p in ((0, 0, 0.35), (1, 1, 0.35), (2, 2, 0.75),
                    (0, 1, 0.12), (0, 2, 0.12), (1, 2, 0.12)):
        m = (comm[:, None] == a) & (comm[None, :] == b)
        probs[m | m.T] = p
    upper = np.triu(rng.random((n, n)) < probs, k=1)
    # guarantee connectivity: chain each node to a random earlier one
    for v in range(1, n):
        if not upper[:v, v].any() and not upper[v, v + 1:].any():
            upper[int(rng.integers(0, v)), v] = True
    u, v = np.nonzero(upper)
    e = np.stack([u, v], axis=1)
    e = np.concatenate([e, e[:, ::-1]], axis=0).astype(np.int64)
    # shuffle node ids so the pattern isn't a contiguous id block
    perm = rng.permutation(n)
    e = perm[e]
    tokens_s = np.empty(n, np.int64)
    labels_s = np.empty(n, np.int64)
    tokens_s[perm] = tokens
    labels_s[perm] = labels
    return n, e, tokens_s, labels_s


def make_corpus(path, n_train, n_valid, n_test, seed=0, name="SBM_PATTERN"):
    rng = np.random.default_rng(seed)
    counts = {"training": n_train, "validation": n_valid, "test": n_test}
    pos = tot = 0
    for si, (split, cnt) in enumerate(counts.items()):
        records = []
        for _ in range(cnt):
            n, edges, tokens, labels = _sbm_pattern_graph(rng)
            pos += int(labels.sum())
            tot += n
            records.append(dict(num_nodes=n, edges=edges,
                                node_features=tokens, node_labels=labels))
        write_records(path, name, split, records,
                      meta={"max_nodes": 33} if si == 0 else None)
    return {"n": sum(counts.values()), "positive_frac": pos / tot}


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
