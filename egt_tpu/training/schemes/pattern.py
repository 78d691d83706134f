"""SBM-PATTERN node-classification schemes
(`lib/training/schemes/pattern/{svd,eig}.py`): class-size-weighted sparse xent over
valid nodes, val_xent monitored; sklearn-based SBM evaluation."""

from __future__ import annotations

import jax.numpy as jnp

from ...data import datasets as D
from ...models.graph_model import GraphModelConfig
from ...utils.hparams import HParams
from .. import metrics as M
from . import sbm_eval
from .base import BaseEigModelScheme, BaseSVDModelScheme


class PatternSchemeMixin:
    DATASET_SPEC = D.SBM_PATTERN
    NUM_NODE_FEATURES = 3
    NUM_TARGETS = 2

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            # fast-path default: SBM graphs vary ~40..190 nodes; two static
            # bucket shapes instead of padding everything to the global max
            length_buckets=[128, 192],
            dataset_name="sbm_pattern",
            class_sizes=[979220, 209900],
            rlr_monitor="val_xent",
            save_best_monitor="val_xent",
        )
        return c

    def get_model_config(self) -> GraphModelConfig:
        return GraphModelConfig(
            **self.model_config_kwargs(),
            node_input_kind="tokens", edge_input_kind="none",
            num_node_features=self.NUM_NODE_FEATURES,
            num_targets=self.NUM_TARGETS, readout_kind="node",
        )

    def loss_and_metrics(self, pred, target, mask, sample_mask):
        cw = M.class_weights_from_sizes(self.config.class_sizes)
        s, c = M.sparse_xent_loss(pred, target, mask, sample_mask,
                                  class_weights=cw)
        loss = s / jnp.maximum(c, 1.0)
        sa, ca = M.accuracy(pred, target, mask, sample_mask)
        return loss, {"xent": (s, c), "acc": (sa, ca)}

    def do_evaluations_on_split(self, split):
        lines = sbm_eval.evaluate_pattern(self, split, self.config.class_sizes)
        self.append_eval(split, lines)


class PatternSVD(PatternSchemeMixin, BaseSVDModelScheme):
    pass


class PatternEig(PatternSchemeMixin, BaseEigModelScheme):
    pass


SCHEMES = {"svd": PatternSVD, "eig": PatternEig}
