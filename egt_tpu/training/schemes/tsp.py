"""TSP edge-classification scheme (`lib/training/schemes/tsp/svd.py`): sparse xent on
the N x N edge-label matrix masked to valid edge-grid positions, batch_size 8,
prediction_bmult 3; P/R/F1 evaluation over valid positions.

Note: the reference accepts an `include_xpose` config key but never forwards it into the
model config (`scheme_base.py:37-60` lacks it) — the adjacency-transpose concat is
effectively always off. We replicate that behavior (the key is accepted and ignored).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import accuracy_score, f1_score, precision_score, recall_score

from ...data import datasets as D
from ...models.graph_model import GraphModelConfig
from ...utils.hparams import HParams
from .. import metrics as M
from .base import BaseSVDModelScheme


class TspSchemeMixin:
    DATASET_SPEC = D.TSP

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            dataset_name="tsp",
            batch_size=8,
            prediction_bmult=3,
            include_xpose=True,   # accepted-but-unforwarded, as in the reference
            save_best_monitor="val_xent",
            rlr_monitor="val_xent",
            # fast-path default: TSP graphs span ~50..500 nodes; bucketed
            # padding replaces the reference's per-batch dynamic padding
            # (`dataset_base.py:100-111`) with a handful of static shapes
            length_buckets=[128, 256, 512],
        )
        return c

    def get_model_config(self) -> GraphModelConfig:
        c = self.config
        return GraphModelConfig(
            **self.model_config_kwargs(),
            node_input_kind="dense", node_feature_dim=2,
            edge_input_kind="dense", edge_feature_dim=1,
            num_targets=2, readout_kind="edge",
            use_node_embeddings=(c.edge_channel_type not in
                                 ("residual", "constrained")),
        )

    def loss_and_metrics(self, pred, target, mask, sample_mask):
        s, c = M.sparse_xent_loss(pred, target, mask, sample_mask)
        loss = s / jnp.maximum(c, 1.0)
        sa, ca = M.accuracy(pred, target, mask, sample_mask)
        return loss, {"xent": (s, c), "acc": (sa, ca)}

    def do_evaluations_on_split(self, split):
        targs, preds = [], []
        for batch, out in self.predict_split(split):
            valid = (batch["feature_matrix"][..., 0].reshape(-1) >= 0)
            targs.append(batch["target"].reshape(-1)[valid])
            preds.append(np.asarray(out).argmax(-1).reshape(-1)[valid])
        targs = np.concatenate(targs)
        preds = np.concatenate(preds)
        self.append_eval(split, [
            f"Accuracy = {accuracy_score(targs, preds)}",
            f"Precision = {precision_score(targs, preds)}",
            f"Recall = {recall_score(targs, preds)}",
            f"f1 = {f1_score(targs, preds)}",
        ])


class TspSVD(TspSchemeMixin, BaseSVDModelScheme):
    pass


SCHEMES = {"svd": TspSVD}
