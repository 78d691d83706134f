"""MNIST superpixel graph-classification scheme
(`lib/training/schemes/mnist/svd.py`): sparse xent + accuracy, val_xent monitored."""

from __future__ import annotations

import jax.numpy as jnp

from ...data import datasets as D
from ...models.graph_model import GraphModelConfig
from ...utils.hparams import HParams
from .. import metrics as M
from .base import BaseSVDModelScheme


class MnistSchemeMixin:
    DATASET_SPEC = D.MNIST
    NODE_FEAT_DIM = 3
    NUM_TARGETS = 10

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            dataset_name="mnist",
            save_best_monitor="val_xent",
        )
        return c

    def get_model_config(self) -> GraphModelConfig:
        return GraphModelConfig(
            **self.model_config_kwargs(),
            node_input_kind="dense", node_feature_dim=self.NODE_FEAT_DIM,
            edge_input_kind="dense", edge_feature_dim=1,
            num_targets=self.NUM_TARGETS, readout_kind="graph",
            readout_edges=False,
        )

    def loss_and_metrics(self, pred, target, mask, sample_mask):
        s, c = M.sparse_xent_loss(pred, target, mask, sample_mask)
        loss = s / jnp.maximum(c, 1.0)
        sa, ca = M.accuracy(pred, target, mask, sample_mask)
        return loss, {"xent": (s, c), "acc": (sa, ca)}

    def do_evaluations_on_split(self, split):
        res = self.evaluate_split(split)
        self.append_eval(split, [
            f"{split} accuracy = {res['acc']:0.5%}",
            f"{split} crossentropy = {res['xent']:0.6f}",
        ])


class MnistSVD(MnistSchemeMixin, BaseSVDModelScheme):
    pass


SCHEMES = {"svd": MnistSVD}
