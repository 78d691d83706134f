"""SBM-CLUSTER node-classification schemes
(`lib/training/schemes/cluster/{svd,eig}.py`): 6-way class-weighted sparse xent."""

from __future__ import annotations

from ...data import datasets as D
from ...utils.hparams import HParams
from . import sbm_eval
from .base import BaseEigModelScheme, BaseSVDModelScheme
from .pattern import PatternSchemeMixin


class ClusterSchemeMixin(PatternSchemeMixin):
    DATASET_SPEC = D.SBM_CLUSTER
    NUM_NODE_FEATURES = 7
    NUM_TARGETS = 6

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            # fast-path default: SBM graphs vary ~40..190 nodes; two static
            # bucket shapes instead of padding everything to the global max
            length_buckets=[128, 192],
            dataset_name="sbm_cluster",
            class_sizes=[19695, 19222, 19559, 19417, 19801, 20139],
        )
        return c

    def do_evaluations_on_split(self, split):
        lines = sbm_eval.evaluate_cluster(self, split)
        self.append_eval(split, lines)


class ClusterSVD(ClusterSchemeMixin, BaseSVDModelScheme):
    pass


class ClusterEig(ClusterSchemeMixin, BaseEigModelScheme):
    pass


SCHEMES = {"svd": ClusterSVD, "eig": ClusterEig}
