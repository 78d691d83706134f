"""Length-bucketed batching tests."""


from egt_tpu.data.dataset import GraphDataset
from egt_tpu.data.datasets import SBM_PATTERN
from tests.synth import make_pattern_like


def test_buckets_cover_all_records(tmp_path):
    f = make_pattern_like(str(tmp_path / "p.h5"), n_records=30, n_min=6,
                          n_max=24)
    ds = GraphDataset(SBM_PATTERN, f, str(tmp_path / "c"),
                      splits=["training"])
    total = 0
    seen_lens = set()
    for batch in ds.batches("training", 4, buckets=[12, 24]):
        total += int(batch["sample_mask"].sum())
        seen_lens.add(batch["node_features"].shape[1])
        # every real graph fits its bucket
        nn = batch["num_nodes"][batch["sample_mask"] > 0]
        assert (nn <= batch["node_features"].shape[1]).all()
    assert total == 30
    assert seen_lens <= {12, 24} and len(seen_lens) == 2


def test_bucket_shuffle_deterministic(tmp_path):
    f = make_pattern_like(str(tmp_path / "p2.h5"), n_records=20)
    ds = GraphDataset(SBM_PATTERN, f, str(tmp_path / "c2"),
                      splits=["training"])
    a = [b["num_nodes"].tolist() for b in
         ds.batches("training", 4, shuffle=True, seed=1, epoch=0,
                    buckets=[24])]
    b = [b["num_nodes"].tolist() for b in
         ds.batches("training", 4, shuffle=True, seed=1, epoch=0,
                    buckets=[24])]
    c = [b["num_nodes"].tolist() for b in
         ds.batches("training", 4, shuffle=True, seed=1, epoch=1,
                    buckets=[24])]
    assert a == b
    assert a != c


def test_training_with_buckets(tmp_path):
    from egt_tpu.training.schemes import import_scheme

    f = make_pattern_like(str(tmp_path / "p3.h5"), n_records=16)
    cfg = {
        "scheme": "pattern.svd",
        "model_name": "pb",
        "dataset_path": f,
        "cache_dir": str(tmp_path / "c3"),
        "save_path": str(tmp_path / "models" / "pb"),
        "batch_size": 4,
        "num_epochs": 1,
        "model_width": 16,
        "edge_width": 8,
        "num_heads": 4,
        "model_height": 2,
        "use_svd": False,
        "upto_hop": 2,
        "log_tensorboard": False,
        "length_buckets": [16, 24],
    }
    scheme = import_scheme("pattern.svd")(cfg)
    scheme.execute_training()
    assert scheme.state["current_epoch"] == 1
