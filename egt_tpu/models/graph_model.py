"""EGTGraphModel: config + params-pytree + pure apply.

TPU-native re-design of the reference's Keras model builder stack
(`lib/models/graph_xformer_model_base.py`, `lib/models/graph_model_base.py`,
`lib/models/<ds>/dc.py`): instead of a functional layer graph with mixin MRO and
implicit Keras mask propagation, ONE immutable params pytree plus ONE pure function —
trivially jit-able, shardable (`jax.sharding` / `shard_map`), checkpointable (orbax),
and differentiable end-to-end. The explicit `node_mask` replaces Keras's invisible
mask flow through ~15 layer types (SURVEY.md §7 "hard parts").

Parameter tree layout (paths are load-compatible with the reference's layer names,
see tests/test_tf_parity.py::keras_name_to_path):

    node_emb / fm_emb / adj_emb / svd_emb / eig_emb / node2edge_emb
    virtual_node_embeddings, virtual_edge_embeddings        (raw arrays)
    stack:
        layers: [ {norm_mha, norm_edge, dense_qkv, dense_mha, dense_edge_b,
                   attention_gates, dense_edge_r,
                   node_ffn{norm, lr1, lr2}, edge_ffn{norm, lr1, lr2}} ... ]
        node_norm_final, edge_norm_final
    mlp_out: {dense: [...]},  target
    distance_head: {mlp: {dense: [...]}, distance_target}

Three task-head families are expressed by `readout_kind`:
'graph' (ZINC/MNIST/CIFAR10/PCQM4Mv2: masked GAP or virtual-node readout,
`zinc/dc.py:101-120`), 'node' (PATTERN/CLUSTER: per-node classifier,
`sbm_pattern/dc.py:55-62`), 'edge' (TSP: per-pair classifier on the edge channel or
pairwise node concat, `tsp/dc.py:79-95`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import features as F
from . import layers as L
from .egt import NEG_INF  # noqa: F401  (re-export for kernel users)


@dataclass
class GraphModelConfig:
    # core transformer (`graph_xformer_model_base.py:17-79`)
    model_width: int = 128
    edge_width: int = 32
    num_heads: int = 8
    model_height: int = 4
    max_length: int | None = None
    gate_attention: bool = True
    node_normalization: str = "layer"
    edge_normalization: str = "layer"
    l2_reg: float = 0.0
    node_dropout: float = 0.0
    edge_dropout: float = 0.0
    add_n_norm: bool = False
    activation: str = "elu"
    mlp_layers: tuple = (0.5, 0.25)
    do_final_norm: bool = True
    clip_logits_value: tuple | None = (-5.0, 5.0)
    edge_activation: str | None = None
    edge_channel_type: str = "residual"   # residual|bias|constrained|none
    combine_layer_repr: bool = False
    ffn_multiplier: float = 2.0
    node2edge_xtalk: float = 0.0
    edge2node_xtalk: float = 0.0
    global_step_layer: bool = False       # accepted; step counting is host-side
    scale_degree: bool = False
    scaler_type: str = "log"
    num_virtual_nodes: int = 0
    random_mask_prob: float = 0.0
    attn_dropout: float = 0.0
    # adjacency / structural (`graph_model_base.py:14-43`)
    use_adj: bool = True
    include_xpose: bool = False
    upto_hop: int = 1
    clip_hops: bool = True
    max_degree_enc: int = 0
    bidir_degree: bool = True
    distance_loss: float = 0.0
    distance_target: int = 8
    max_diffuse_t: int = 0
    # positional encodings (`graph_model_base.py:284-414`)
    use_svd: bool = False
    num_svd_features: int = 16
    sel_svd_features: int = 8
    transform_svd: bool = False
    use_eig: bool = False
    num_eig_features: int = 20
    sel_eig_features: int = 8
    transform_eig: bool = False
    random_neg: bool = False
    # inputs / task head (`<ds>/dc.py`)
    node_input_kind: str = "tokens"       # tokens|dense
    edge_input_kind: str = "tokens"       # tokens|dense|none
    num_node_features: int = 28
    num_edge_features: int = 4
    node_feature_dim: int | None = None   # dense-feature width
    edge_feature_dim: int | None = None
    node_vocab_sizes: tuple | None = None  # multi-column tokens (OGB)
    edge_vocab_sizes: tuple | None = None
    num_targets: int = 1
    readout_kind: str = "graph"           # graph|node|edge
    readout_edges: bool = False
    node2edge_embed: bool = False
    use_node_embeddings: bool = False     # TSP ablation pairwise-cat readout
    mask_value: float = -1.0
    # TPU execution knobs (no reference equivalent)
    attention_impl: str = "auto"          # einsum (MXU dots) | vpu (elementwise
    #   chains, keeps per-pair tensors in the elementwise layout — wins at
    #   small head dims where the dots underfill the MXU and force relayouts)
    #   | auto (measured per-shape rule, ops/crossover.py)
    attn_chain_f32: bool = True           # False: logits/softmax/gate chain in
    #   the compute dtype (bf16 halves its HBM traffic; accumulations stay f32)
    fused_attention: bool | str = False   # Pallas kernel (ops/egt_pallas.py);
    #   True | False | "auto" (per-traced-shape measured rule: with
    #   attention_impl "auto" the joint vs-best argmin — bf16 admits the
    #   kernel at l >= ~286 for ew=64; ops/crossover.py::auto_dispatch)
    fused_edge_block: bool = False        # Pallas kernel (ops/edge_block_pallas.py)
    fused_layer: bool | str = False       # whole-layer Pallas megakernel
    #   (ops/fused_layer_pallas.py); subsumes the two kernels above for the
    #   pre-LN residual/constrained family. True | False | "auto" (measured
    #   per-traced-shape rule, ops/crossover.py::fused_layer_wins — checked
    #   BEFORE the attention-path cascade, which is the fallback when the
    #   kernel is ineligible or unmeasured at the shape)
    compute_dtype: str = "float32"        # float32 | bfloat16
    remat: bool | str = False             # per-layer rematerialization:
    #   True recomputes the whole layer in the backward pass; "dots" keeps
    #   every matmul output resident (jax.checkpoint_policies.
    #   dots_with_no_batch_dims_saveable) and recomputes only the elementwise
    #   per-pair chain (clip/+E/mask/softmax/gate) — the quadratic HBM-traffic
    #   saves without re-running the FFN/projection GEMMs full remat re-pays

    def __post_init__(self):
        if self.scale_degree and not self.gate_attention:
            raise ValueError("scale_degree only works with gate_attention")
        if self.scale_degree and self.edge_channel_type == "none":
            # 'none' forces ungated attention (`graph_xformer_model_base.py:
            # 164-169`), which the reference's EGT layer rejects with
            # scale_degree at build time (`egt_layers.py:20-21`)
            raise ValueError("scale_degree requires an edge channel "
                             "(edge_channel_type != 'none')")
        if self.edge_channel_type not in ("residual", "bias", "constrained",
                                          "none"):
            raise ValueError(f"unknown edge_channel_type "
                             f"{self.edge_channel_type!r}")
        if self.scaler_type not in ("log", "linear"):
            raise ValueError("scaler_type must be log or linear")

    @property
    def has_edge_stream(self) -> bool:
        return self.edge_channel_type != "none"

    @property
    def needs_edge_embedding(self) -> bool:
        """The reference always builds the edge embedding; here it is skipped
        only when nothing consumes it (pure compute saving). With
        edge_channel_type='none' the stack passes e through UNCHANGED, so the
        distance head / edge readouts see the raw embedding — reference
        behavior (`graph_xformer_model_base.py:164-171`)."""
        return (self.has_edge_stream or self.distance_loss > 0
                or self.readout_kind == "edge" or self.readout_edges)

    @property
    def edge_residual(self) -> bool:
        return self.edge_channel_type in ("residual", "constrained")


class ModelContext:
    """Side outputs of one forward pass: auxiliary losses, metric scalars,
    BatchNorm moving-stat updates (path-keyed under params['stack']) and analysis
    captures (the reference's `Analysis` subsystem, `lib/models/analysis.py`)."""

    def __init__(self):
        self.losses: dict = {}
        self.metrics: dict = {}
        self.stats_updates: dict = {}
        self.analysis: dict = {}


def _ffn_dims(cfg: GraphModelConfig):
    """FFN hidden dims after cross-talk (`graph_xformer_model_base.py:260-307`)."""
    hn = round(cfg.model_width * cfg.ffn_multiplier)
    he = round(cfg.edge_width * cfg.ffn_multiplier)
    nx_e2n = round(cfg.edge2node_xtalk * he / cfg.ffn_multiplier) \
        if cfg.edge2node_xtalk > 0 else 0
    nx_n2e = round(cfg.node2edge_xtalk * hn / cfg.ffn_multiplier) \
        if cfg.node2edge_xtalk > 0 else 0
    node_lr2_in = hn - 2 * nx_n2e + nx_e2n
    edge_lr2_in = he - 2 * nx_e2n + nx_n2e
    return hn, he, node_lr2_in, edge_lr2_in


class EGTGraphModel:
    def __init__(self, cfg: GraphModelConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------------ init

    def init(self, key) -> dict:
        cfg = self.cfg
        w, ew, h = cfg.model_width, cfg.edge_width, cfg.num_heads
        keys = iter(jax.random.split(key, 64 + 16 * cfg.model_height))
        params: dict = {}

        # node embedding
        if cfg.node_input_kind == "tokens":
            if cfg.node_vocab_sizes is not None:
                vocab = int(sum(cfg.node_vocab_sizes)) + 1
            else:
                vocab = cfg.num_node_features + 1
            params["node_emb"] = F.embedding_params(next(keys), vocab, w)
        elif cfg.node_input_kind == "dense":
            params["node_emb"] = F.dense_params(next(keys),
                                                cfg.node_feature_dim, w)
        else:
            raise ValueError(cfg.node_input_kind)

        if cfg.use_svd and cfg.transform_svd:
            params["svd_emb"] = F.dense_params(next(keys),
                                               2 * cfg.sel_svd_features, w)
        if cfg.use_eig and cfg.transform_eig:
            params["eig_emb"] = F.dense_params(next(keys),
                                               cfg.sel_eig_features, w)
        if cfg.max_degree_enc > 0:
            din = (cfg.max_degree_enc + 1) * (2 if cfg.bidir_degree else 1)
            # the reference uses a 'uniform' kernel here (`graph_model_base.py:172-174`)
            params["degree_emb"] = F.dense_params_uniform(next(keys), din, w)

        # edge embeddings (the edge stream feeds gates/bias even in 'bias' mode;
        # 'none' still needs them when the distance head or an edge readout
        # consumes the pass-through channel)
        if cfg.needs_edge_embedding:
            if cfg.edge_input_kind == "tokens":
                if cfg.edge_vocab_sizes is not None:
                    vocab = int(sum(cfg.edge_vocab_sizes)) + 1
                else:
                    vocab = cfg.num_edge_features + 1
                params["fm_emb"] = F.embedding_params(next(keys), vocab, ew)
            elif cfg.edge_input_kind == "dense":
                params["fm_emb"] = F.dense_params(next(keys),
                                                  cfg.edge_feature_dim, ew)
            if cfg.use_adj and cfg.upto_hop >= 1:
                hop_in = cfg.upto_hop * (2 if cfg.include_xpose else 1)
                params["adj_emb"] = F.dense_params(next(keys), hop_in, ew)
            if cfg.node2edge_embed:
                if cfg.node_input_kind == "tokens":
                    params["node2edge_emb"] = F.embedding_params(
                        next(keys), cfg.num_node_features + 1, 2 * ew)
                else:
                    params["node2edge_emb"] = F.dense_params(
                        next(keys), cfg.node_feature_dim, 2 * ew)
            if cfg.max_diffuse_t > 0:
                params["diffusion_emb"] = F.dense_params(
                    next(keys), ew * cfg.max_diffuse_t, ew)

        if cfg.num_virtual_nodes > 0:
            params["virtual_node_embeddings"] = F.uniform_05(
                next(keys), (cfg.num_virtual_nodes, w))
            if cfg.needs_edge_embedding:
                params["virtual_edge_embeddings"] = F.uniform_05(
                    next(keys), (cfg.num_virtual_nodes, ew))

        # transformer stack
        hn, he, node_lr2_in, edge_lr2_in = _ffn_dims(cfg)
        layers_p = []
        for _ in range(cfg.model_height):
            lp = {
                "norm_mha": L.norm_param_shapes(cfg.node_normalization, w),
                "dense_qkv": F.dense_params(next(keys), w, 3 * w),
                "dense_mha": F.dense_params(next(keys), w, w),
                "node_ffn": {
                    "norm": L.norm_param_shapes(cfg.node_normalization, w),
                    "lr1": F.dense_params(next(keys), w, hn),
                    "lr2": F.dense_params(next(keys), node_lr2_in, w),
                },
            }
            if cfg.has_edge_stream:
                lp["dense_edge_b"] = F.dense_params(next(keys), ew, h)
                if cfg.gate_attention:
                    lp["attention_gates"] = F.dense_params(next(keys), ew, h)
            if cfg.edge_residual:
                lp["norm_edge"] = L.norm_param_shapes(cfg.edge_normalization,
                                                      ew)
                lp["dense_edge_r"] = F.dense_params(next(keys), h, ew)
                lp["edge_ffn"] = {
                    "norm": L.norm_param_shapes(cfg.edge_normalization, ew),
                    "lr1": F.dense_params(next(keys), ew, he),
                    "lr2": F.dense_params(next(keys), edge_lr2_in, ew),
                }
            layers_p.append(lp)
        stack = {"layers": layers_p}
        if (not cfg.add_n_norm) and cfg.do_final_norm:
            stack["node_norm_final"] = L.norm_param_shapes(
                cfg.node_normalization, w)
            if cfg.edge_residual:
                stack["edge_norm_final"] = L.norm_param_shapes(
                    cfg.edge_normalization, ew)
        params["stack"] = stack

        # distance-objective head (`graph_model_base.py:79-95`)
        if cfg.distance_loss > 0:
            din = ew
            mlp = []
            for f in cfg.mlp_layers:
                dout = round(f * w)
                mlp.append(F.dense_params(next(keys), din, dout))
                din = dout
            params["distance_head"] = {
                "mlp": {"dense": mlp},
                "distance_target": F.dense_params(next(keys), din,
                                                  cfg.distance_target + 1),
            }

        # readout MLP + target head
        din = self._readout_in_dim()
        mlp = []
        for f in cfg.mlp_layers:
            dout = round(f * w)
            mlp.append(F.dense_params(next(keys), din, dout))
            din = dout
        params["mlp_out"] = {"dense": mlp}
        params["target"] = F.dense_params(next(keys), din, cfg.num_targets)
        return params

    def _readout_in_dim(self) -> int:
        cfg = self.cfg
        w, ew = cfg.model_width, cfg.edge_width
        if cfg.readout_kind == "graph":
            din = w * max(1, cfg.num_virtual_nodes)
            if cfg.readout_edges:
                din += ew
            return din
        if cfg.readout_kind == "node":
            return w
        if cfg.readout_kind == "edge":
            return (2 * w + ew) if cfg.use_node_embeddings else ew
        raise ValueError(cfg.readout_kind)

    # ----------------------------------------------------------------------- masks

    def node_valid(self, batch):
        cfg = self.cfg
        nf = batch["node_features"]
        if cfg.node_input_kind == "tokens":
            ids = nf if nf.ndim == 2 else nf[..., 0]
            return ids >= 0
        return jnp.any(nf != cfg.mask_value, axis=-1)

    def edge_valid(self, batch):
        cfg = self.cfg
        fm = batch.get("feature_matrix")
        if fm is None:
            return None
        if cfg.edge_input_kind == "tokens":
            ids = fm if fm.ndim == 3 else fm[..., 0]
            return ids >= 0
        return jnp.any(fm != cfg.mask_value, axis=-1)

    def output_mask(self, batch):
        """The mask Keras would invisibly feed into compiled losses/metrics."""
        kind = self.cfg.readout_kind
        if kind == "graph":
            return None
        if kind == "node":
            return self.node_valid(batch)
        if kind == "edge":
            return self.edge_valid(batch)
        raise ValueError(kind)

    # ----------------------------------------------------------------- embeddings

    def _embed_nodes(self, params, batch, training, rng, sp=None):
        cfg = self.cfg
        nf = batch["node_features"]
        if cfg.node_input_kind == "tokens":
            if cfg.node_vocab_sizes is not None:
                h = F.multi_token_embed(params["node_emb"], nf,
                                        cfg.node_vocab_sizes)
            else:
                h = F.token_embed(params["node_emb"], nf)
        else:
            h = F.masked_dense_embed(params["node_emb"],
                                     nf.astype(jnp.float32), cfg.mask_value)

        if cfg.use_svd:
            pe_rng = None if rng is None else L.fold_rng(rng, 101)
            h = h + F.process_svd(
                params.get("svd_emb"), batch["singular_vectors"],
                sel=cfg.sel_svd_features, model_width=cfg.model_width,
                transform=cfg.transform_svd, random_neg=cfg.random_neg,
                training=training, rng=pe_rng)
        if cfg.use_eig:
            pe_rng = None if rng is None else L.fold_rng(rng, 102)
            h = h + F.process_eig(
                params.get("eig_emb"), batch["eigen_vectors"],
                sel=cfg.sel_eig_features, model_width=cfg.model_width,
                transform=cfg.transform_eig, random_neg=cfg.random_neg,
                training=training, rng=pe_rng)
        if cfg.max_degree_enc > 0:
            if sp is not None:
                deg = F.degree_encoding_sp(batch["graph_matrix"],
                                           cfg.max_degree_enc,
                                           cfg.bidir_degree, sp.axis)
            else:
                deg = F.degree_encoding(batch["graph_matrix"],
                                        cfg.max_degree_enc, cfg.bidir_degree)
            h = h + F.dense(params["degree_emb"], deg)
        return h

    def _embed_edges(self, params, batch, sp):
        """Edge-channel embedding; rows are shard-local under sp."""
        cfg = self.cfg
        parts = []
        fm_emb = None
        if cfg.edge_input_kind != "none":
            fm = batch["feature_matrix"]
            if cfg.edge_input_kind == "tokens":
                if cfg.edge_vocab_sizes is not None:
                    fm_emb = F.multi_token_embed(params["fm_emb"], fm,
                                                 cfg.edge_vocab_sizes)
                else:
                    fm_emb = F.token_embed(params["fm_emb"], fm)
            else:
                fm_emb = F.masked_dense_embed(params["fm_emb"],
                                              fm.astype(jnp.float32),
                                              cfg.mask_value)
            parts.append(fm_emb)
        if cfg.use_adj and cfg.upto_hop >= 1:
            adj = batch["graph_matrix"]
            if sp is not None:
                hops = F.stack_hops_sp(adj, cfg.upto_hop, sp.axis,
                                       cfg.clip_hops,
                                       include_xpose=cfg.include_xpose,
                                       index=sp.index, lq=sp.lq)
            else:
                hops = F.stack_hops(adj, cfg.upto_hop, cfg.clip_hops)
                if cfg.include_xpose:
                    hops = jnp.concatenate(
                        [hops, jnp.transpose(hops, (0, 2, 1, 3))], axis=-1)
            parts.append(F.dense(params["adj_emb"], hops))
        if cfg.node2edge_embed:
            nf = batch["node_features"]
            if cfg.node_input_kind == "tokens":
                pe = F.token_embed(params["node2edge_emb"], nf)
            else:
                pe = F.dense(params["node2edge_emb"], nf.astype(jnp.float32))
            if sp is not None:
                parts.append(F.pairwise_add_sp(pe, sp.index, sp.lq))
            else:
                parts.append(F.pairwise_add(pe))
        if cfg.max_diffuse_t > 0:
            em = self.edge_valid(batch)
            if sp is not None:
                parts.append(F.dense(
                    params["diffusion_emb"],
                    F.edge_diffusion_sp(fm_emb, batch["graph_matrix"], em,
                                        cfg.max_diffuse_t, sp.axis)))
            else:
                parts.append(F.dense(
                    params["diffusion_emb"],
                    F.edge_diffusion(fm_emb, batch["graph_matrix"], em,
                                     cfg.max_diffuse_t)))
        if not parts:
            raise ValueError("edge stream requested but no edge inputs")
        e = parts[0]
        for p in parts[1:]:
            e = e + p
        return e

    # ------------------------------------------------------------------- forward

    def apply(self, params, batch, training: bool = False, rng=None,
              capture_analysis: bool = False, sp_axis: str | None = None):
        cfg = self.cfg
        ctx = ModelContext()
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # the dataset ships the adjacency in a narrow integer wire dtype
        # (`data/dataset.py::_compress`); upcast once on device
        if "graph_matrix" in batch and \
                not jnp.issubdtype(batch["graph_matrix"].dtype, jnp.floating):
            batch = dict(batch)
            batch["graph_matrix"] = batch["graph_matrix"].astype(jnp.float32)

        sp = None
        if sp_axis is not None:
            self._check_sp_supported(training)
            size = jax.lax.psum(1, sp_axis)
            index = jax.lax.axis_index(sp_axis)
            lq = batch["graph_matrix"].shape[1] if "graph_matrix" in batch \
                else batch["feature_matrix"].shape[1]
            sp = L.SPContext(axis=sp_axis, size=size, index=index, lq=lq,
                             vn=cfg.num_virtual_nodes)

        node_mask = self.node_valid(batch)

        # distance-objective target from the raw adjacency
        # (`graph_model_base.py:59-77`)
        dist_target = None
        if cfg.distance_loss > 0:
            if sp is not None:
                dist_target = F.distance_targets_sp(
                    batch["graph_matrix"], cfg.distance_target, sp.axis)
            else:
                dist_target = F.distance_targets(batch["graph_matrix"],
                                                 cfg.distance_target)

        h = self._embed_nodes(params, batch, training, rng, sp)
        e = self._embed_edges(params, batch, sp) \
            if cfg.needs_edge_embedding else None

        # hard attention mask for the 'constrained' variant
        # (`graph_model_base.py:131-142`) — (b, l_q, l), head-shared
        edge_mask = None
        if cfg.edge_channel_type == "constrained":
            edge_mask = batch["graph_matrix"]

        if cfg.num_virtual_nodes > 0:
            h = F.prepend_virtual_nodes(h, params["virtual_node_embeddings"])
            if e is not None:
                if sp is not None:
                    e = F.prepend_virtual_edges_sp(
                        e, params["virtual_edge_embeddings"])
                else:
                    e = F.prepend_virtual_edges(
                        e, params["virtual_edge_embeddings"])
            k = cfg.num_virtual_nodes
            node_mask = jnp.pad(node_mask, ((0, 0), (k, 0)),
                                constant_values=True)
            if edge_mask is not None:
                b, lrows, l = edge_mask.shape
                em = jnp.concatenate(
                    [jnp.ones((b, k, l), edge_mask.dtype), edge_mask], axis=1)
                edge_mask = jnp.concatenate(
                    [jnp.ones((b, lrows + k, k), edge_mask.dtype), em], axis=2)

        h = h.astype(dtype)
        if e is not None:
            e = e.astype(dtype)

        # transformer stack
        all_node_repr, all_edge_repr = [], []
        layer_params = params["stack"]["layers"]

        def run_layer(p, h, e, rng_l, idx):
            return L.layer_forward(p, cfg, h, e, node_mask, edge_mask,
                                   training, rng_l, sp, capture_analysis, idx)

        use_remat = cfg.remat and not capture_analysis
        remat_kw = {}
        if cfg.remat == "dots":
            remat_kw["policy"] = \
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        # when every layer takes the whole-layer kernel at this traced shape
        # (same static condition the per-layer dispatch evaluates), keep e in
        # the kernel's packed row form across the stack: pack/unpack once
        # instead of per layer (the reshapes at the pallas-call boundary
        # otherwise materialize as relayout copies)
        from ..ops import fused_layer_pallas as flp
        pack_through = (
            e is not None
            and flp.can_fuse_layer(cfg, training, sp, capture_analysis,
                                   e.shape[1])
            and (cfg.edge_channel_type != "constrained"
                 or edge_mask is not None))
        if pack_through:
            e = flp.pack_for_stack(e, cfg)
        for i in range(cfg.model_height):
            rng_l = None if rng is None else L.fold_rng(rng, 1000 + i)
            fn = run_layer
            if use_remat:
                fn = jax.checkpoint(run_layer, static_argnums=(4,), **remat_kw)
            h, e, node_repr, edge_repr, updates, analysis = fn(
                layer_params[i], h, e, rng_l, i)
            ctx.analysis.update(analysis)
            for path, val in updates.items():
                ctx.stats_updates[("layers", i) + path] = val
            if cfg.combine_layer_repr:
                all_node_repr.append(node_repr)
                if edge_repr is not None:
                    all_edge_repr.append(edge_repr)
        if pack_through:
            e = flp.unpack_from_stack(e)

        if (not cfg.add_n_norm) and cfg.do_final_norm:
            norm_node = L.make_norm(cfg.node_normalization)
            h, upd = norm_node(params["stack"]["node_norm_final"], h, training)
            if upd:
                ctx.stats_updates[("node_norm_final",)] = upd
            if cfg.edge_residual:
                norm_edge = L.make_norm(cfg.edge_normalization, sp)
                e, upd = norm_edge(params["stack"]["edge_norm_final"], e,
                                   training)
                if upd:
                    ctx.stats_updates[("edge_norm_final",)] = upd

        if cfg.combine_layer_repr:
            ctx.analysis["all_node_repr"] = all_node_repr
            ctx.analysis["all_edge_repr"] = all_edge_repr

        # VN crop + distance auxiliary loss (`graph_model_base.py:270-281,79-95`)
        if cfg.num_virtual_nodes > 0 and e is not None:
            k = cfg.num_virtual_nodes
            e = e[:, k:, k:, :]
        if cfg.distance_loss > 0:
            x = e.astype(jnp.float32)
            for dp in params["distance_head"]["mlp"]["dense"]:
                x = L.activation(cfg.activation, F.dense(dp, x))
            logits = F.dense(params["distance_head"]["distance_target"], x)
            elem = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1),
                dist_target[..., None], axis=-1)[..., 0]
            elem = elem * (dist_target > 0)
            per_sample = jnp.sum(elem.reshape(elem.shape[0], -1), axis=-1)
            if sp is not None:
                per_sample = jax.lax.psum(per_sample, sp.axis)
            metric = jnp.mean(per_sample)   # reference add_metric value
            ctx.metrics["distance_loss"] = metric
            ctx.losses["distance_loss"] = metric * cfg.distance_loss
            # the reference layer passes the distance logits on as the new e
            e = logits

        out = self._readout(params, h, e, node_mask, batch, sp)
        return out.astype(jnp.float32), ctx

    # ------------------------------------------------------------------- readout

    def _mlp_out(self, params, x):
        cfg = self.cfg
        x = x.astype(jnp.float32)
        for dp in params["mlp_out"]["dense"]:
            x = L.activation(cfg.activation, F.dense(dp, x))
        return F.dense(params["target"], x)

    def _readout(self, params, h, e, node_mask, batch, sp):
        cfg = self.cfg
        kind = cfg.readout_kind
        if kind == "graph":
            if cfg.num_virtual_nodes > 0:
                k = cfg.num_virtual_nodes
                x = h[:, :k].reshape(h.shape[0], k * h.shape[-1])
            else:
                m = node_mask.astype(jnp.float32)[..., None]
                s = jnp.sum(h.astype(jnp.float32) * m, axis=1)
                c = jnp.sum(m, axis=1)
                x = s / jnp.maximum(c, 1.0)
            if cfg.readout_edges:
                em = self.edge_valid(batch).astype(jnp.float32)[..., None]
                es = jnp.sum(e.astype(jnp.float32) * em, axis=(1, 2))
                ec = jnp.sum(em, axis=(1, 2))
                if sp is not None:  # rows are disjoint shards: exact psum
                    es = jax.lax.psum(es, sp.axis)
                    ec = jax.lax.psum(ec, sp.axis)
                x = jnp.concatenate([x, es / jnp.maximum(ec, 1.0)], axis=-1)
            return self._mlp_out(params, x)
        k = cfg.num_virtual_nodes
        if kind == "node":
            out = self._mlp_out(params, h)
            if sp is not None:
                out = L.sp_row_slice(out, sp)  # slice offsets past VN rows
            elif k > 0:
                out = out[:, k:]  # per-node readout excludes the VN aggregators
            return out
        if kind == "edge":
            if cfg.use_node_embeddings:
                hc = h[:, k:] if k > 0 else h  # e is VN-cropped; match it
                row = L.sp_row_slice(h, sp) if sp is not None else hc
                he = F.pairwise_cat(row, hc)
                x = jnp.concatenate([he, e.astype(he.dtype)], axis=-1)
            else:
                x = e
            return self._mlp_out(params, x)
        raise ValueError(kind)

    # ------------------------------------------------------------------ analysis

    def analyze(self, params, batch, training: bool = False, rng=None) -> dict:
        """Per-layer attention logits / matrices / gates, the JAX equivalent of the
        reference's second "analysis model" (`graph_xformer_model_base.py:492-506`):
        the same pure function re-run with capture enabled — no weight-sharing
        machinery needed."""
        _, ctx = self.apply(params, batch, training=training, rng=rng,
                            capture_analysis=True)
        return ctx.analysis

    # ----------------------------------------------------------------------- misc

    def _check_sp_supported(self, training: bool):
        cfg = self.cfg
        unsupported = []
        if cfg.num_virtual_nodes > 0:
            if cfg.edge_normalization == "batch":
                # replicated VN rows would be multiply-counted in the psum'd
                # edge-stream batch statistics
                unsupported.append("BatchNorm edge normalization with "
                                   "virtual nodes")
            if training and (cfg.random_mask_prob > 0 or cfg.attn_dropout > 0):
                unsupported.append("stochastic attention with virtual nodes "
                                   "(replicated VN rows would diverge)")
        if unsupported:
            raise NotImplementedError(
                "edge partitioning does not support: " + ", ".join(unsupported))
