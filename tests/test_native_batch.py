"""Native C++ batch assembler vs. the pure-numpy path — bit-exact equality."""

import os

import numpy as np
import pytest

from egt_tpu import native
from egt_tpu.data.dataset import GraphDataset
from egt_tpu.data.datasets import TSP, ZINC
from tests.synth import make_tsp_like, make_zinc_like


@pytest.fixture(scope="module")
def native_ok():
    if not native.available():
        pytest.skip("native batch builder unavailable (no g++?)")
    return True


def _batches_both_ways(ds, split, bs):
    batches_native = list(ds.batches(split, bs, shuffle=False))
    os.environ["EGT_TPU_NO_NATIVE"] = "1"
    try:
        batches_numpy = list(ds.batches(split, bs, shuffle=False))
    finally:
        del os.environ["EGT_TPU_NO_NATIVE"]
    return batches_native, batches_numpy


def test_zinc_batches_match(tmp_path, native_ok):
    f = make_zinc_like(str(tmp_path / "z.h5"), n_records=20)
    ds = GraphDataset(ZINC, f, str(tmp_path / "c"), splits=["training"],
                      pe="svd", num_features=4)
    nat, ref = _batches_both_ways(ds, "training", 8)
    assert len(nat) == len(ref)
    for bn, br in zip(nat, ref):
        assert set(bn) == set(br)
        for k in br:
            np.testing.assert_array_equal(bn[k], br[k], err_msg=k)


def test_tsp_batches_match(tmp_path, native_ok):
    f = make_tsp_like(str(tmp_path / "t.h5"), n_records=6)
    ds = GraphDataset(TSP, f, str(tmp_path / "c2"), splits=["training"])
    nat, ref = _batches_both_ways(ds, "training", 4)
    for bn, br in zip(nat, ref):
        for k in br:
            np.testing.assert_array_equal(bn[k], br[k], err_msg=k)


def test_pcqm_multi_int_batches_match(tmp_path, native_ok):
    """(E, 3) integer bond features: the multi-column int C++ path is bit-exact
    vs numpy (PCQM4Mv2 is the one multi-million-graph dataset, where host
    batch assembly actually matters)."""
    from egt_tpu.data.datasets import PCQM4MV2
    from tests.test_pcqm4mv2 import make_pcqm_like

    f = make_pcqm_like(str(tmp_path / "p.h5"), n_records=18)
    ds = GraphDataset(PCQM4MV2, f, str(tmp_path / "c3"), splits=["training"],
                      pe="svd", num_features=4)
    nat, ref = _batches_both_ways(ds, "training", 8)
    assert len(nat) == len(ref)
    saw_multi = False
    for bn, br in zip(nat, ref):
        assert set(bn) == set(br)
        for k in br:
            np.testing.assert_array_equal(bn[k], br[k], err_msg=k)
        if bn["feature_matrix"].ndim == 4:
            saw_multi = True
    assert saw_multi  # (b, L, L, 3) path actually exercised
