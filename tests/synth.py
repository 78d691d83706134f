"""Synthetic HDF5 dataset fixtures matching the reference schema (for pipeline and
end-to-end tests; see `create_hdf_benchmarking_datasets.ipynb` schema notes in
SURVEY.md §2.7)."""

import numpy as np

from egt_tpu.data.hdf5_io import write_records


def _random_graph(rng, n_min, n_max):
    n = int(rng.integers(n_min, n_max + 1))
    m = int(rng.integers(n, 3 * n))
    src = rng.integers(0, n, size=m)
    dst = (src + 1 + rng.integers(0, max(n - 1, 1), size=m)) % n
    edges = np.stack([src, dst], axis=1).astype(np.int64)
    edges = np.unique(edges, axis=0)
    return n, edges


def make_zinc_like(path, n_records=32, n_min=6, n_max=14, seed=0,
                   splits=("training", "validation", "test"), name="ZINC"):
    """Learnable toy regression: target = #nodes/10 + mean(node token)/30."""
    rng = np.random.default_rng(seed)
    for si, split in enumerate(splits):
        records = []
        for _ in range(n_records):
            n, edges = _random_graph(rng, n_min, n_max)
            nodef = rng.integers(0, 28, size=n).astype(np.int64)
            edgef = rng.integers(0, 4, size=len(edges)).astype(np.int64)
            target = np.array([n / 10.0 + nodef.mean() / 30.0], np.float32)
            records.append(dict(num_nodes=n, edges=edges, node_features=nodef,
                                edge_features=edgef, value=target))
        write_records(path, name, split, records,
                      meta={"max_nodes": n_max} if si == 0 else None)
    return path


def make_pattern_like(path, n_records=16, n_min=8, n_max=20, seed=0,
                      splits=("training", "validation", "test"),
                      name="SBM_PATTERN", num_feats=3):
    """Toy node classification: label = (feature token > 0)."""
    rng = np.random.default_rng(seed)
    for split in splits:
        records = []
        for _ in range(n_records):
            n, edges = _random_graph(rng, n_min, n_max)
            nodef = rng.integers(0, num_feats, size=n).astype(np.int64)
            labels = (nodef > 0).astype(np.int64)
            records.append(dict(num_nodes=n, edges=edges, node_features=nodef,
                                node_labels=labels))
        write_records(path, name, split, records)
    return path


def make_tsp_like(path, n_records=8, n_min=10, n_max=24, seed=0,
                  splits=("training", "validation", "test"), name="TSP"):
    """Toy edge classification on 2-D points: label short edges as positive."""
    rng = np.random.default_rng(seed)
    for split in splits:
        records = []
        for _ in range(n_records):
            n, edges = _random_graph(rng, n_min, n_max)
            pts = rng.random((n, 2)).astype(np.float32)
            d = np.linalg.norm(pts[edges[:, 0]] - pts[edges[:, 1]], axis=-1)
            edgef = d[:, None].astype(np.float32)
            labels = (d < np.median(d)).astype(np.int64)
            records.append(dict(num_nodes=n, edges=edges, node_features=pts,
                                edge_features=edgef, edge_labels=labels))
        write_records(path, name, split, records)
    return path


def make_mnist_like(path, n_records=16, n_min=8, n_max=20, seed=0,
                    splits=("training", "validation", "test"), name="MNIST",
                    feat_dim=3, num_classes=10):
    rng = np.random.default_rng(seed)
    for split in splits:
        records = []
        for _ in range(n_records):
            n, edges = _random_graph(rng, n_min, n_max)
            nodef = rng.random((n, feat_dim)).astype(np.float32)
            edgef = rng.random((len(edges), 1)).astype(np.float32)
            label = int(rng.integers(0, num_classes))
            records.append(dict(num_nodes=n, edges=edges, node_features=nodef,
                                edge_features=edgef, label=label))
        write_records(path, name, split, records)
    return path
