"""Synthetic PCQM4Mv2-format corpus (multi-column OGB atom/bond features) with
a structural regression target — the EGT-Large dress rehearsal data (VERDICT
round 2, item 8).

The real PCQM4Mv2 (OGB-LSC, 3.4M molecules, HOMO-LUMO gap) is not downloadable
here (zero egress), so this generator produces a corpus in the exact on-disk
schema `tools/convert_pcqm4mv2.py` would emit — 9 int node-feature columns /
3 int edge-feature columns with the standard OGB vocab sizes — whose target is
a deterministic structural function of the graph (1-hop token interactions via
the atomic-number column, mean shortest-path length, triangle density, and a
bond-type effect), so a converging model can push val MAE far below the
target's std. Graphs are molecular-like: tree + chords, degree <= 4, 4..32
heavy atoms (PCQM4Mv2's mean is ~14).

Column semantics mirror OGB's atom encoder: column 0 = atomic number (vocab
119, only the organic-chemistry head of the table is populated), column 3 =
degree (as OGB records it), remaining columns are correlated or uniform
nuisance features — so the multi-column embedding sum has one informative
column per stream plus distractors, like the real data.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import shortest_path

from egt_tpu.data.datasets import OGB_ATOM_DIMS, OGB_BOND_DIMS
from egt_tpu.data.hdf5_io import write_records
from tools.synth_molecular import _molecular_graph

ATOM_HEAD = 36   # populated slice of the 119-entry atomic-number vocab


def _target(n, edges_undir, z, bond, T, B):
    u, v = edges_undir[:, 0], edges_undir[:, 1]
    t_edge = float(T[z[u], z[v]].mean())
    t_bond = float(B[bond].mean())
    adj = csr_matrix((np.ones(len(u)), (u, v)), shape=(n, n))
    adj = adj + adj.T
    sp = shortest_path(adj, method="D", unweighted=True)
    t_sp = float(sp[np.isfinite(sp)].mean())
    a = (adj > 0).astype(np.int64).toarray()
    tri = np.trace(a @ a @ a) / 6.0
    return 1.0 * t_edge + 0.25 * t_sp + 1.0 * tri / n + 0.5 * t_bond


def make_corpus(path, n_train, n_valid, n_test, seed=0):
    rng = np.random.default_rng(seed)
    trng = np.random.default_rng(54321)
    T = trng.normal(0, 0.5, size=(ATOM_HEAD, ATOM_HEAD))
    T = (T + T.T) / 2.0
    B = trng.normal(0, 0.5, size=(OGB_BOND_DIMS[0],))
    counts = {"training": n_train, "validation": n_valid, "test": n_test}
    stats = []
    for si, (split, cnt) in enumerate(counts.items()):
        records = []
        for _ in range(cnt):
            n, edges, deg = _molecular_graph(rng, n_min=4, n_max=32)
            z = ((deg * 5 + rng.integers(0, 9, size=n)) % ATOM_HEAD
                 ).astype(np.int64)
            nodef = np.empty((n, len(OGB_ATOM_DIMS)), np.int64)
            nodef[:, 0] = z
            nodef[:, 3] = np.minimum(deg, OGB_ATOM_DIMS[3] - 1)
            for ci in (1, 2, 4, 5, 6, 7, 8):
                nodef[:, ci] = rng.integers(0, OGB_ATOM_DIMS[ci], size=n)
            ne2 = len(edges) // 2
            bond = rng.integers(0, OGB_BOND_DIMS[0], size=ne2)
            edgef = np.empty((2 * ne2, len(OGB_BOND_DIMS)), np.int64)
            edgef[:, 0] = np.concatenate([bond, bond])
            for ci in (1, 2):
                col = rng.integers(0, OGB_BOND_DIMS[ci], size=ne2)
                edgef[:, ci] = np.concatenate([col, col])
            y = _target(n, edges[:ne2], z, bond, T, B)
            stats.append(y)
            records.append(dict(num_nodes=n, edges=edges, node_features=nodef,
                                edge_features=edgef,
                                value=np.array([y], np.float32)))
        write_records(path, "PCQM4MV2", split, records,
                      meta={"max_nodes": 32} if si == 0 else None)
    s = np.asarray(stats)
    return {"n": len(s), "target_mean": float(s.mean()),
            "target_std": float(s.std())}


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--train", type=int, default=50000)
    ap.add_argument("--valid", type=int, default=5000)
    ap.add_argument("--test", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    info = make_corpus(args.path, args.train, args.valid, args.test, args.seed)
    print(json.dumps(info))
