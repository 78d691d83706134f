"""Integration tests for tools/create_hdf_datasets.py (VERDICT r2 item 9):
the converter runs against a fake DGL-like loader and a pickle source, and its
output feeds this framework's dataset pipeline end to end."""

import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "create_hdf_datasets", os.path.join(REPO, "tools",
                                        "create_hdf_datasets.py"))
chd = importlib.util.module_from_spec(spec)
spec.loader.exec_module(chd)


class _Tensor:
    """Minimal torch-tensor stand-in (the converter only calls .numpy())."""

    def __init__(self, arr):
        self._a = np.asarray(arr)

    def numpy(self):
        return self._a

    def __array__(self, dtype=None, copy=None):
        # torch tensors are np.stack-able via the array protocol
        return self._a if dtype is None else self._a.astype(dtype)


class _FakeDGLGraph:
    def __init__(self, rng, n, with_edge_feat):
        self._n = n
        u = rng.integers(0, n, size=2 * n)
        v = rng.integers(0, n, size=2 * n)
        self._u, self._v = _Tensor(u), _Tensor(v)
        self.ndata = {"feat": _Tensor(rng.integers(0, 5, size=n))}
        self.edata = (
            {"feat": _Tensor(rng.integers(0, 3, size=2 * n))}
            if with_edge_feat else {})

    def number_of_nodes(self):
        return self._n

    def edges(self):
        return self._u, self._v


def _fake_split(rng, count, label_kind):
    out = []
    for _ in range(count):
        n = int(rng.integers(5, 12))
        g = _FakeDGLGraph(rng, n, with_edge_feat=(label_kind == "value"))
        if label_kind == "value":
            label = np.array([rng.normal()], np.float32)
        elif label_kind == "scalar":
            label = np.int64(rng.integers(0, 10))
        else:  # node labels
            label = rng.integers(0, 2, size=n)
        out.append((g, label))
    return out


def test_records_from_dgl_with_fake_loader(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)

    class _FakeDS:
        train = _fake_split(rng, 6, "value")
        val = _fake_split(rng, 3, "value")
        test = _fake_split(rng, 3, "value")

    fake_pkg = types.ModuleType("data")
    fake_mod = types.ModuleType("data.data")
    fake_mod.LoadData = lambda name: _FakeDS()
    fake_pkg.data = fake_mod
    monkeypatch.setitem(sys.modules, "data", fake_pkg)
    monkeypatch.setitem(sys.modules, "data.data", fake_mod)

    splits = chd.records_from_dgl("ZINC")
    assert set(splits) == {"training", "validation", "test"}
    rec = splits["training"][0]
    assert rec["edges"].shape[1] == 2
    assert "value" in rec and rec["value"].shape == (1,)
    assert "edge_features" in rec

    out = tmp_path / "zinc.h5"
    for split, records in splits.items():
        from egt_tpu.data.hdf5_io import write_records
        write_records(str(out), "ZINC", split, records)

    # the converted file feeds the real pipeline
    from egt_tpu.data.dataset import GraphDataset
    from egt_tpu.data.datasets import SPECS
    ds = GraphDataset(SPECS["zinc"], str(out), cache_dir=str(tmp_path / "c"),
                      splits=("training",), pe=None)
    batches = list(ds.batches("training", batch_size=4, shuffle=False,
                              seed=0, epoch=0, pad_len=12))
    assert batches and batches[0]["node_features"].shape[1] == 12


def test_node_label_routing(monkeypatch):
    rng = np.random.default_rng(1)

    class _FakeDS:
        train = _fake_split(rng, 2, "nodes")
        val = _fake_split(rng, 1, "nodes")
        test = _fake_split(rng, 1, "nodes")

    fake_pkg = types.ModuleType("data")
    fake_mod = types.ModuleType("data.data")
    fake_mod.LoadData = lambda name: _FakeDS()
    fake_pkg.data = fake_mod
    monkeypatch.setitem(sys.modules, "data", fake_pkg)
    monkeypatch.setitem(sys.modules, "data.data", fake_mod)

    splits = chd.records_from_dgl("SBM_PATTERN")
    rec = splits["training"][0]
    assert "node_labels" in rec
    assert len(rec["node_labels"]) == rec["num_nodes"]


def test_pickle_source_cli(tmp_path, capsys):
    rng = np.random.default_rng(2)
    recs = {}
    for split, cnt in (("training", 5), ("validation", 2), ("test", 2)):
        rows = []
        for _ in range(cnt):
            n = int(rng.integers(4, 9))
            e = np.stack([rng.integers(0, n, 8), rng.integers(0, n, 8)], 1)
            rows.append(dict(num_nodes=n, edges=e,
                             node_features=rng.integers(0, 5, size=n),
                             edge_features=rng.integers(0, 3, size=8),
                             target=np.array([rng.normal()], np.float32)))
        recs[split] = rows
    pkl = tmp_path / "src.pkl"
    with open(pkl, "wb") as fp:
        pickle.dump(recs, fp)

    out = tmp_path / "out.h5"
    argv = sys.argv
    sys.argv = ["create_hdf_datasets.py", "ZINC", "--source", "pickle",
                str(pkl), "--out", str(out), "--target-key", "value"]
    try:
        chd.main()
    finally:
        sys.argv = argv
    assert "wrote 5 records" in capsys.readouterr().out

    import h5py
    with h5py.File(out) as f:
        g = f["ZINC"]["training"]["0000000000"]
        assert g["data"].attrs["num_nodes"] >= 4
        assert g["targets"]["value"].shape == (1,)


def test_pickle_rejects_non_dict(tmp_path):
    pkl = tmp_path / "bad.pkl"
    with open(pkl, "wb") as fp:
        pickle.dump([1, 2, 3], fp)
    with pytest.raises(ValueError):
        chd.records_from_pickle(str(pkl))
