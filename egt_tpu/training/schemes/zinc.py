"""ZINC molecular-regression schemes (`lib/training/schemes/zinc/{svd,eig}.py`).

MAE loss on the graph-level target, val_mae monitored for save-best/RLR.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...data import datasets as D
from ...models.graph_model import GraphModelConfig
from ...utils.hparams import HParams
from .. import metrics as M
from .base import BaseEigModelScheme, BaseSVDModelScheme


class ZincEvalMixin:
    def do_evaluations_on_split(self, split):
        res = self.evaluate_split(split)
        mae = res.get("mae", res["loss"])
        self.append_eval(split, [f"{split} MAE = {mae:0.5f}"])


class ZincSchemeMixin(ZincEvalMixin):
    DATASET_SPEC = D.ZINC

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            dataset_name="zinc",
            num_virtual_nodes=0,
            rlr_monitor="val_mae",
            save_best_monitor="val_mae",
        )
        return c

    def get_model_config(self) -> GraphModelConfig:
        return GraphModelConfig(
            **self.model_config_kwargs(),
            node_input_kind="tokens", edge_input_kind="tokens",
            num_node_features=28, num_edge_features=4,
            num_targets=1, readout_kind="graph", readout_edges=False,
            num_virtual_nodes=self.config.num_virtual_nodes,
        )

    def loss_and_metrics(self, pred, target, mask, sample_mask):
        s, c = M.mae_loss(pred, target, mask, sample_mask)
        loss = s / jnp.maximum(c, 1.0)
        return loss, {"mae": (s, c)}


class ZincSVD(ZincSchemeMixin, BaseSVDModelScheme):
    pass


class ZincEig(ZincSchemeMixin, BaseEigModelScheme):
    pass


SCHEMES = {"svd": ZincSVD, "eig": ZincEig}
