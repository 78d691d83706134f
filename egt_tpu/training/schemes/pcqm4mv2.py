"""PCQM4Mv2 (OGB-LSC) HOMO-LUMO-gap regression scheme.

The reference TF repo defers this large-scale task to its companion PyTorch repo
(reference README.md:14, val MAE 0.1224 / test-dev 0.0872); here it is first-class:
multi-column OGB atom/bond embeddings, virtual-node readout, no PE by default,
optional dynamic centrality scalers — the EGT-large recipe. Convert the OGB data
with tools/convert_pcqm4mv2.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...data import datasets as D
from ...models.graph_model import GraphModelConfig
from ...utils.hparams import HParams
from .. import metrics as M
from .base import BaseAdjModelScheme, BaseSVDModelScheme


class Pcqm4mv2Mixin:
    DATASET_SPEC = D.PCQM4MV2

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            dataset_name="pcqm4mv2",
            num_virtual_nodes=1,
            scale_degree=True,
            attn_dropout=0.0,
            rlr_monitor="val_mae",
            save_best_monitor="val_mae",
        )
        return c

    def get_model_config(self) -> GraphModelConfig:
        kw = self.model_config_kwargs()
        kw["scale_degree"] = self.config.scale_degree
        return GraphModelConfig(
            **kw,
            node_input_kind="tokens", node_vocab_sizes=D.OGB_ATOM_DIMS,
            edge_input_kind="tokens", edge_vocab_sizes=D.OGB_BOND_DIMS,
            num_targets=1, readout_kind="graph",
            num_virtual_nodes=self.config.num_virtual_nodes,
        )

    def loss_and_metrics(self, pred, target, mask, sample_mask):
        s, c = M.mae_loss(pred, target, mask, sample_mask)
        loss = s / jnp.maximum(c, 1.0)
        return loss, {"mae": (s, c)}

    def do_evaluations_on_split(self, split):
        res = self.evaluate_split(split)
        mae = res.get("mae", res["loss"])
        self.append_eval(split, [f"{split} MAE = {mae:0.5f}"])


class Pcqm4mv2Base(Pcqm4mv2Mixin, BaseAdjModelScheme):
    pass


class Pcqm4mv2SVD(Pcqm4mv2Mixin, BaseSVDModelScheme):
    pass


SCHEMES = {"base": Pcqm4mv2Base, "svd": Pcqm4mv2SVD}
