"""Scheme base classes: the task-binding layer.

Mirrors the reference's override-chain structure (`lib/training/schemes/scheme_base.py`):
`BaseDCModelScheme` exposes the model-hyperparameter config surface, `BaseAdjModelScheme`
adds the adjacency/distance-objective knobs, `BaseSVDModelScheme`/`BaseEigModelScheme`
add positional-encoding knobs and bind the PE preprocessing. Concrete dataset schemes
live in sibling modules and are resolved by name '<dataset>.<pe>' (see __init__.py).
"""

from __future__ import annotations

from ...data.dataset import DatasetSpec, GraphDataset
from ...utils.hparams import Derived, HParams
from ..trainer import TrainingBase


class BaseDCModelScheme(TrainingBase):
    DATASET_SPEC: DatasetSpec = None  # set by concrete schemes

    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            model_name="dc",
            dataset_name="dataset",
            dataset_path=Derived(
                lambda c: f"datasets/{c.dataset_name.upper()}/"
                          f"{c.dataset_name.upper()}.h5"),
            cache_dir=Derived(
                lambda c: f"data_cache/{c.dataset_name.upper()}/data"),
            save_path=Derived(
                lambda c: f"models/{c.dataset_name.lower()}/{c.model_name}"),
            model_width=48,
            model_height=4,
            edge_width=48,
            num_heads=8,
            gate_attention=True,
            scale_degree=False,
            l2_reg=0,
            dropout=0,
            attn_dropout=0.0,
            edge_dropout=None,
            mlp_layers=[0.5, 0.25],
            edge_activation=None,
            edge_channel_type="residual",
            combine_layer_repr=False,
            max_shuffle_len=10000,
            ffn_multiplier=2.0,
            warmup_steps=0,
            total_steps=None,
            random_mask_prob=0.0,
        )
        return c

    def model_config_kwargs(self) -> dict:
        c = self.config
        return dict(
            model_width=c.model_width,
            edge_width=c.edge_width,
            num_heads=c.num_heads,
            gate_attention=c.gate_attention,
            scale_degree=c.scale_degree,
            random_mask_prob=c.random_mask_prob,
            attn_dropout=c.attn_dropout,
            model_height=c.model_height,
            l2_reg=c.l2_reg,
            node_dropout=c.dropout,
            edge_dropout=c.dropout if c.edge_dropout is None else c.edge_dropout,
            mlp_layers=tuple(c.mlp_layers),
            edge_channel_type=c.edge_channel_type,
            edge_activation=c.edge_activation,
            ffn_multiplier=c.ffn_multiplier,
            combine_layer_repr=c.combine_layer_repr,
        )

    def dataset_kwargs(self) -> dict:
        return dict(
            dataset_path=self.config.dataset_path,
            cache_dir=self.config.cache_dir,
        )

    def get_dataset(self, splits):
        return GraphDataset(self.DATASET_SPEC, splits=splits,
                            **self.dataset_kwargs())


class BaseAdjModelScheme(BaseDCModelScheme):
    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            model_name="dc_mat",
            cache_dir=Derived(
                lambda c: f"data_cache/{c.dataset_name.upper()}/mat"),
            upto_hop=1,
            distance_loss=0.0,
            distance_target=8,
        )
        return c

    def model_config_kwargs(self) -> dict:
        kw = super().model_config_kwargs()
        c = self.config
        kw.update(
            upto_hop=c.upto_hop,
            distance_loss=c.distance_loss,
            distance_target=c.distance_target,
        )
        return kw


class BaseSVDModelScheme(BaseAdjModelScheme):
    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            model_name="dc_svd",
            cache_dir=Derived(
                lambda c: f"data_cache/{c.dataset_name.upper()}/"
                          f"svd_{c.num_svd_features}"),
            num_svd_features=16,
            sel_svd_features=8,
            use_svd=True,
            random_neg=True,
        )
        return c

    def dataset_kwargs(self) -> dict:
        kw = super().dataset_kwargs()
        if self.config.use_svd:
            kw.update(pe="svd", num_features=self.config.num_svd_features)
        return kw

    def model_config_kwargs(self) -> dict:
        kw = super().model_config_kwargs()
        c = self.config
        kw.update(
            use_svd=c.use_svd,
            transform_svd=True,  # the reference scheme always transforms SVD PEs
            random_neg=c.random_neg,
            num_svd_features=c.num_svd_features,
            sel_svd_features=c.sel_svd_features,
        )
        return kw


class BaseEigModelScheme(BaseAdjModelScheme):
    def get_default_config(self) -> HParams:
        c = super().get_default_config()
        c.update(
            model_name="dc_eig",
            cache_dir=Derived(
                lambda c: f"data_cache/{c.dataset_name.upper()}/"
                          f"eig_{c.num_eig_features}"),
            num_eig_features=20,
            sel_eig_features=8,
            use_eig=True,
        )
        return c

    def dataset_kwargs(self) -> dict:
        kw = super().dataset_kwargs()
        if self.config.use_eig:
            kw.update(pe="eig", num_features=self.config.num_eig_features)
        return kw

    def model_config_kwargs(self) -> dict:
        kw = super().model_config_kwargs()
        c = self.config
        kw.update(
            use_eig=c.use_eig,
            transform_eig=False,   # `scheme_base.py:179-189`
            random_neg=True,
            num_eig_features=c.num_eig_features,
            sel_eig_features=c.sel_eig_features,
        )
        return kw
