"""ZINC-full schemes (`lib/training/schemes/zinc_full/{svd,eig}.py`) — identical to
ZINC but bound to the full dataset."""

from ...data import datasets as D
from ...utils.hparams import HParams
from .base import BaseEigModelScheme, BaseSVDModelScheme
from .zinc import ZincSchemeMixin


class ZincFullSchemeMixin(ZincSchemeMixin):
    DATASET_SPEC = D.ZINC_FULL

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(dataset_name="zinc_full")
        return c


class ZincFullSVD(ZincFullSchemeMixin, BaseSVDModelScheme):
    pass


class ZincFullEig(ZincFullSchemeMixin, BaseEigModelScheme):
    pass


SCHEMES = {"svd": ZincFullSVD, "eig": ZincFullEig}
