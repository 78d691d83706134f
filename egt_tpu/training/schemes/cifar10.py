"""CIFAR10 superpixel graph-classification scheme
(`lib/training/schemes/cifar10/svd.py`): like MNIST with 5-dim node features and
virtual-node capability (`lib/models/cifar10/dc.py:16`)."""

from __future__ import annotations

from ...data import datasets as D
from ...models.graph_model import GraphModelConfig
from ...utils.hparams import HParams
from .base import BaseSVDModelScheme
from .mnist import MnistSchemeMixin


class Cifar10SchemeMixin(MnistSchemeMixin):
    DATASET_SPEC = D.CIFAR10
    NODE_FEAT_DIM = 5
    NUM_TARGETS = 10

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            dataset_name="cifar10",
            num_virtual_nodes=0,
        )
        return c

    def get_model_config(self) -> GraphModelConfig:
        cfg = super().get_model_config()
        cfg.num_virtual_nodes = self.config.num_virtual_nodes
        return cfg


class Cifar10SVD(Cifar10SchemeMixin, BaseSVDModelScheme):
    pass


SCHEMES = {"svd": Cifar10SVD}
