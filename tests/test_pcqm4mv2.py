"""PCQM4Mv2 scheme: multi-column OGB features end-to-end on synthetic data."""

import numpy as np

from egt_tpu.data.datasets import OGB_ATOM_DIMS, OGB_BOND_DIMS
from egt_tpu.data.hdf5_io import write_records
from egt_tpu.training.schemes import import_scheme
from tests.synth import _random_graph


def make_pcqm_like(path, n_records=16, seed=0):
    rng = np.random.default_rng(seed)
    for split in ("training", "validation", "test"):
        records = []
        for _ in range(n_records):
            n, edges = _random_graph(rng, 4, 14)
            nodef = np.stack([rng.integers(0, d, size=n)
                              for d in OGB_ATOM_DIMS], axis=1).astype(np.int64)
            edgef = np.stack([rng.integers(0, d, size=len(edges))
                              for d in OGB_BOND_DIMS], axis=1).astype(np.int64)
            gap = np.asarray([n / 10.0], np.float32)
            records.append(dict(num_nodes=n, edges=edges, node_features=nodef,
                                edge_features=edgef, value=gap))
        write_records(path, "PCQM4MV2", split, records)
    return path


def test_pcqm4mv2_trains(tmp_path):
    f = make_pcqm_like(str(tmp_path / "p.h5"))
    cfg = {
        "scheme": "pcqm4mv2.base",
        "model_name": "pq",
        "dataset_path": f,
        "cache_dir": str(tmp_path / "c"),
        "save_path": str(tmp_path / "m"),
        "batch_size": 8,
        "num_epochs": 2,
        "model_width": 16,
        "edge_width": 8,
        "num_heads": 4,
        "model_height": 2,
        "upto_hop": 2,
        "num_virtual_nodes": 1,
        "log_tensorboard": False,
    }
    scheme = import_scheme("pcqm4mv2.base")(cfg)
    scheme.execute_training()
    assert scheme.state["current_epoch"] == 2
    res = scheme.evaluate_split("validation")
    assert np.isfinite(res["mae"])
    scheme2 = import_scheme("pcqm4mv2.base")(dict(cfg, weight_file=""))
    scheme2.do_evaluations()
