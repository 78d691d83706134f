"""The dual-stream (node + edge channel) EGT transformer layer.

Functional re-design of the reference's layer builders
(`lib/models/graph_xformer_model_base.py:88-352`): one params subtree per layer, one
pure function per block. Pre-LN by default; `add_n_norm=True` gives the post-norm
("add-then-norm") arrangement. Edge-channel variants:

- 'residual' / 'constrained': pre-norm on E; gates + edge bias projected from the
  normed E (`:192-212`); post-attention Dense(edge_width) + dropout + residual
  (`:214-222`); 'constrained' additionally applies the hard adjacency attention mask.
- 'bias': gates/bias projected from raw E; the edge channel itself is NOT updated
  (`:173-190`).
- 'none': ungated attention with no edge bias at all (`:164-171`).

Dual FFN with optional node<->edge cross-talk (`:260-324`): with cross-talk the lr1
activation is deferred until after the exchanged features are concatenated, exactly
as the reference's Lambda arranges it (`:230-246,304-307`).

Normalization: LayerNorm/BatchNorm with Keras defaults (epsilon=1e-3, BN
momentum=0.99); norms run in float32 islands under bfloat16 compute. BatchNorm batch
statistics are computed over all non-feature axes with no masking, as Keras does.

Sequence-parallel (sp) execution: the edge channel and attention grid carry only a
row shard; the node stream is kept full (replicated) — each layer all-gathers its
attention output rows over ICI so the next layer's K/V are full, cross-talk psums
its row-partial column sums, and row-local dropout folds the shard index into the
PRNG key.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .egt import egt_attention_core, split_qkv
from .features import dense


class SPContext(NamedTuple):
    axis: str       # mesh axis name the edge rows are sharded over
    size: int       # number of shards
    index: jax.Array  # this shard's position along the axis
    lq: int         # local (per-shard) number of query rows (excluding VN rows)
    vn: int = 0     # virtual-node rows, replicated at the top of every shard


def sp_row_slice(x, sp: SPContext, axis: int = 1):
    """This shard's local rows of a full-length tensor (past the VN prefix)."""
    return jax.lax.dynamic_slice_in_dim(x, sp.vn + sp.index * sp.lq, sp.lq,
                                        axis)


def sp_take_rows(x, sp: SPContext, axis: int = 1):
    """Query-side rows of a full tensor: the replicated VN prefix + this shard's
    local rows — the row layout every per-pair tensor carries under sp."""
    local = sp_row_slice(x, sp, axis)
    if sp.vn == 0:
        return local
    vn_part = jax.lax.slice_in_dim(x, 0, sp.vn, axis=axis)
    return jnp.concatenate([vn_part, local], axis=axis)


def sp_gather_rows(x, sp: SPContext, axis: int = 1):
    """Assemble full rows from per-shard row blocks; a replicated VN prefix is
    taken once (it is identical on every shard by construction)."""
    if sp.vn == 0:
        return jax.lax.all_gather(x, sp.axis, axis=axis, tiled=True)
    vn_part = jax.lax.slice_in_dim(x, 0, sp.vn, axis=axis)
    local = jax.lax.slice_in_dim(x, sp.vn, x.shape[axis], axis=axis)
    gathered = jax.lax.all_gather(local, sp.axis, axis=axis, tiled=True)
    return jnp.concatenate([vn_part, gathered], axis=axis)


def fold_rng(rng, *ints):
    for i in ints:
        rng = jax.random.fold_in(rng, i)
    return rng


# -------------------------------------------------------------------- normalization


def layer_norm(p, x, eps: float = 1e-3):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["gamma"] + p["beta"]).astype(x.dtype)


def batch_norm(p, x, training: bool, eps: float = 1e-3, momentum: float = 0.99,
               sp: SPContext | None = None):
    """Returns (y, moving-stat updates | None). With `sp`, `x` is a row shard of
    the logical tensor: batch statistics are combined exactly across shards with
    a psum of (sum, sum-of-squares)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(xf.ndim - 1))
    if training:
        if sp is not None:
            n = float(np.prod(xf.shape[:-1]))
            s = jax.lax.psum(jnp.sum(xf, axis=axes), sp.axis)
            ss = jax.lax.psum(jnp.sum(jnp.square(xf), axis=axes), sp.axis)
            n_total = n * sp.size
            mu = s / n_total
            var = ss / n_total - jnp.square(mu)
        else:
            mu = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mu), axis=axes)
        updates = {
            "moving_mean": momentum * p["moving_mean"] + (1 - momentum) * mu,
            "moving_var": momentum * p["moving_var"] + (1 - momentum) * var,
        }
    else:
        mu, var = p["moving_mean"], p["moving_var"]
        updates = None
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]
    return y.astype(x.dtype), updates


def make_norm(kind: str, sp: SPContext | None = None):
    """Normalization closure returning (y, updates|None) for uniform handling.
    Pass `sp` for tensors that carry only a row shard (the edge stream)."""
    if kind == "layer":
        return lambda p, x, training: (layer_norm(p, x), None)
    if kind == "batch":
        return lambda p, x, training: batch_norm(p, x, training, sp=sp)
    raise ValueError(f"unknown normalization {kind!r}")


def norm_param_shapes(kind: str, dim: int):
    p = {"gamma": jnp.ones((dim,), jnp.float32),
         "beta": jnp.zeros((dim,), jnp.float32)}
    if kind == "batch":
        p["moving_mean"] = jnp.zeros((dim,), jnp.float32)
        p["moving_var"] = jnp.ones((dim,), jnp.float32)
    return p


# --------------------------------------------------------------------- activations


def activation(name, x):
    if name is None:
        return x
    if name.lower().startswith("lrelu"):
        alpha = float(name[-1]) / 10.0  # `graph_xformer_model_base.py:151-156`
        return jax.nn.leaky_relu(x, alpha)
    return getattr(jax.nn, name)(x)


def dropout(x, rate: float, training: bool, rng):
    if not training or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng at training time")
    keep = 1.0 - rate
    mask = jax.random.uniform(rng, x.shape, dtype=jnp.float32) >= rate
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


def sp_dropout_rows(x_rows, rate: float, training: bool, rng, sp: SPContext):
    """Dropout on a per-shard row block: local rows draw shard-independent bits,
    while the replicated VN prefix draws shard-SHARED bits so it stays identical
    on every shard."""
    if not training or rate <= 0.0:
        return x_rows
    if sp.vn == 0:
        return dropout(x_rows, rate, training, fold_rng(rng, 7002, sp.index))
    vn_part = dropout(x_rows[:, :sp.vn], rate, training, fold_rng(rng, 7001))
    local = dropout(x_rows[:, sp.vn:], rate, training,
                    fold_rng(rng, 7002, sp.index))
    return jnp.concatenate([vn_part, local], axis=1)


# ------------------------------------------------------------------ attention block


def _auto_fused(cfg, l: int) -> bool:
    """Resolve fused_attention per TRACED shape: with length buckets each pad
    length compiles its own program, so small buckets keep the einsum path
    even when the dataset-wide max crosses the kernel's crossover. The
    decision rule is DERIVED from the measured matrix (CROSSOVER_MATRIX.json,
    v5e bf16 train step; see ops/crossover.py). When attention_impl is also
    "auto" the decision is the JOINT argmin over {Pallas kernel, einsum, vpu}
    — the round-3 sweep measured vpu+c16 beating the kernel at l=192, so a
    kernel-first rule cascade would dispatch a measured loser."""
    if cfg.fused_attention == "auto":
        from ..ops.crossover import auto_dispatch, fused_attention_wins
        if getattr(cfg, "attention_impl", "auto") == "auto":
            return auto_dispatch(l, cfg.edge_width,
                                 cfg.model_width // cfg.num_heads,
                                 cfg.num_heads,
                                 str(cfg.compute_dtype)) == "attn"
        return fused_attention_wins(l, cfg.edge_width, str(cfg.compute_dtype))
    return bool(cfg.fused_attention)


def _attention(p, cfg, h_n, e_bias_raw, gates_raw, node_mask, edge_mask,
               training, rng, sp: SPContext | None, capture: bool):
    """QKV projection + EGT attention. `e_bias_raw`/`gates_raw` are the (b, l_q, l, h)
    projections (row-local under sp); `edge_mask` is (b, l_q, l) head-shared or None.
    Returns (v_att (b, l_q, d*h), h_hat, a_tild)."""
    use_fused = _auto_fused(cfg, h_n.shape[1]) and not capture
    kw = dict(
        clip_logits_value=(tuple(cfg.clip_logits_value)
                           if cfg.clip_logits_value is not None else None),
        scale_degree=cfg.scale_degree,
        scaler_type=cfg.scaler_type,
        num_virtual_nodes=cfg.num_virtual_nodes,
        random_mask_prob=cfg.random_mask_prob,
        attn_dropout=cfg.attn_dropout,
        training=training,
        rng=rng,
    )
    if sp is not None and training and (cfg.random_mask_prob > 0
                                        or cfg.attn_dropout > 0):
        if sp.vn > 0:
            raise NotImplementedError(
                "stochastic attention with virtual nodes under edge "
                "partitioning (replicated VN rows would diverge)")
        # independent stochastic draws per row shard
        kw["rng"] = fold_rng(rng, 613, sp.index)

    if use_fused:
        from ..ops.egt_pallas import egt_attention_fused

        qkv = dense(p["dense_qkv"], h_n)
        b, l, f = qkv.shape
        d = f // (3 * cfg.num_heads)
        qkv_hm = qkv.reshape(b, l, 3, d, cfg.num_heads)
        q = jnp.transpose(qkv_hm[:, :, 0], (0, 3, 1, 2))
        k = jnp.transpose(qkv_hm[:, :, 1], (0, 3, 1, 2))
        v = jnp.transpose(qkv_hm[:, :, 2], (0, 3, 1, 2))
        if sp is not None:
            # rectangular kernel: this shard's query rows, full K/V
            q = sp_take_rows(q, sp, axis=2)
        e_hm = (None if e_bias_raw is None
                else jnp.transpose(e_bias_raw, (0, 3, 1, 2)))
        g_hm = (None if gates_raw is None
                else jnp.transpose(gates_raw, (0, 3, 1, 2)))
        out = egt_attention_fused(
            q, k, v, e_hm, g_hm, node_mask=node_mask, attn_mask_hm=edge_mask,
            **{k2: v2 for k2, v2 in kw.items()})
        # h_hat back to (b, l_q, l, h) for the edge-stream Dense
        h_hat = jnp.transpose(out.h_hat, (0, 2, 3, 1))
        return out.v_att, h_hat, None

    qkv = dense(p["dense_qkv"], h_n)
    q, k, v = split_qkv(qkv, cfg.num_heads)
    if sp is not None:
        q = sp_take_rows(q, sp)
    am = None if edge_mask is None else edge_mask[..., None]
    impl, chain_f32 = _resolve_attention_impl(cfg, h_n.shape[1])
    out = egt_attention_core(q, k, v, e_bias_raw, gates_raw,
                             node_mask=node_mask, attn_mask=am,
                             impl=impl, chain_f32=chain_f32, **kw)
    return out.v_att, out.h_hat, out.a_tild


def _resolve_attention_impl(cfg, l: int) -> tuple[str, bool]:
    """(impl, chain_f32) for the non-Pallas path, resolved per traced shape.
    'auto' consults the measured rule in ops/crossover.py; when it dispatches
    to vpu it also takes the bf16 per-pair chain — the measurement and the
    convergence gate that admit matrix rows are for the PAIR (DESIGN_NOTES
    "Round-3 vpu+c16")."""
    impl = getattr(cfg, "attention_impl", "auto")
    chain_f32 = bool(getattr(cfg, "attn_chain_f32", True))
    if impl == "auto":
        from ..ops.crossover import auto_dispatch, vpu_attention_wins
        d = cfg.model_width // cfg.num_heads
        if cfg.fused_attention == "auto":
            # same joint argmin as _auto_fused, so the two sites agree
            win = auto_dispatch(l, cfg.edge_width, d, cfg.num_heads,
                                str(cfg.compute_dtype)) == "vpu"
        else:
            win = vpu_attention_wins(l, d, cfg.num_heads,
                                     str(cfg.compute_dtype))
        if win:
            return "vpu", False
        return "einsum", chain_f32
    return impl, chain_f32


def _mha_block(p, cfg, norm_node, h, e_bias, gates, node_mask, edge_mask,
               training, rng, sp, capture, analysis, tag):
    """Pre/post-norm MHA with residual (`graph_xformer_model_base.py:106-145`).
    Under sp, `h` is full; the attention output rows are gathered back to full."""
    updates = {}
    y = h
    if not cfg.add_n_norm:
        h, upd = norm_node(p["norm_mha"], h, training)
        if upd:
            updates[("norm_mha",)] = upd

    node_repr = h  # `all_node_repr` capture point (`:111`)

    v_att, h_hat, a_tild = _attention(
        p, cfg, h, e_bias, gates, node_mask, edge_mask, training, rng, sp,
        capture)
    if capture:
        analysis[f"mha_{tag}/e"] = h_hat
        analysis[f"mha_{tag}/mat"] = a_tild

    h = dense(p["dense_mha"], v_att)
    if cfg.node_dropout > 0 and training:
        if sp is not None:
            h = sp_dropout_rows(h, cfg.node_dropout, training, fold_rng(rng, 2),
                                sp)
        else:
            h = dropout(h, cfg.node_dropout, training, fold_rng(rng, 2))
    if sp is not None:
        h = sp_gather_rows(h, sp)
    h = h + y
    if cfg.add_n_norm:
        h, upd = norm_node(p["norm_mha"], h, training)
        if upd:
            updates[("norm_mha",)] = upd
    return h, h_hat, node_repr, updates


def _edge_bias(p, cfg, e):
    """dense_edge_b with optional (leaky-)ReLU (`graph_xformer_model_base.py:149-162`)."""
    eb = dense(p["dense_edge_b"], e)
    return activation(cfg.edge_activation, eb)


def edge_update(p, cfg, norm_node, norm_edge, h, e, node_mask, edge_mask,
                training, rng, sp, capture, analysis, tag,
                defer_edge_tail: bool = False):
    """One attention sub-layer for all four edge-channel variants. Returns
    (h, e, node_repr, edge_repr, stats_updates); with `defer_edge_tail`, the
    residual edge-channel tail is left to the fused Pallas edge block and `e`
    comes back as the (h_hat, e_residual) pair instead."""
    updates = {}
    variant = cfg.edge_channel_type

    if variant == "none":
        if capture:
            analysis[f"dense_edge_b_{tag}/e"] = e
        h, _, node_repr, upd = _mha_block(
            p, cfg, norm_node, h, None, None, node_mask, edge_mask,
            training, rng, sp, capture, analysis, tag)
        updates.update(upd)
        return h, e, node_repr, None, updates

    if variant == "bias":
        gates = None
        if cfg.gate_attention:
            gates = dense(p["attention_gates"], e)
            if capture:
                analysis[f"attention_gates_{tag}/gates"] = gates
        eb = _edge_bias(p, cfg, e)
        if capture:
            analysis[f"dense_edge_b_{tag}/e"] = eb
        h, _, node_repr, upd = _mha_block(
            p, cfg, norm_node, h, eb, gates, node_mask, edge_mask,
            training, rng, sp, capture, analysis, tag)
        updates.update(upd)
        return h, e, node_repr, None, updates

    # 'residual' and 'constrained' (`graph_xformer_model_base.py:192-223`)
    y_e = e
    if not cfg.add_n_norm:
        e, upd = norm_edge(p["norm_edge"], e, training)
        if upd:
            updates[("norm_edge",)] = upd
    edge_repr = e

    gates = None
    if cfg.gate_attention:
        gates = dense(p["attention_gates"], e)
        if capture:
            analysis[f"attention_gates_{tag}/gates"] = gates
    eb = _edge_bias(p, cfg, e)
    if capture:
        analysis[f"dense_edge_b_{tag}/e"] = eb

    h, h_hat, node_repr, upd = _mha_block(
        p, cfg, norm_node, h, eb, gates, node_mask, edge_mask,
        training, rng, sp, capture, analysis, tag)
    updates.update(upd)

    if defer_edge_tail:
        # the fused Pallas edge block handles dense_edge_r + residual + FFN
        return h, (h_hat, y_e), node_repr, edge_repr, updates

    e = dense(p["dense_edge_r"], h_hat)
    if cfg.edge_dropout > 0 and training:
        if sp is not None:
            e = sp_dropout_rows(e, cfg.edge_dropout, training, fold_rng(rng, 3),
                                sp)
        else:
            e = dropout(e, cfg.edge_dropout, training, fold_rng(rng, 3))
    e = e + y_e
    if cfg.add_n_norm:
        e, upd = norm_edge(p["norm_edge"], e, training)
        if upd:
            updates[("norm_edge",)] = upd
    return h, e, node_repr, edge_repr, updates


# ------------------------------------------------------------------------ FFN block


def _xtalk(cfg, x_h, x_e, node_mask, sp: SPContext | None):
    """Node<->edge cross-talk on the FFN hidden features
    (`graph_xformer_model_base.py:260-307`). Under sp, x_e carries local rows."""
    x_h_n = None
    if cfg.edge2node_xtalk > 0.0:
        he = x_e.shape[-1]
        nx_s = round(cfg.edge2node_xtalk * he / cfg.ffn_multiplier)
        nx_t = he - nx_s * 2
        x_er, x_ec, x_e = jnp.split(x_e, [nx_s, 2 * nx_s], axis=3)
        m = node_mask.astype(x_h.dtype)
        if sp is not None:
            m_rows = sp_take_rows(m, sp)                       # rows of this shard
            weighted = x_er * m_rows[:, :, None, None]
            # VN rows are replicated on every shard: sum them once, psum only the
            # disjoint local-row partial sums
            x_er = jax.lax.psum(jnp.sum(weighted[:, sp.vn:], axis=1), sp.axis)
            if sp.vn:
                x_er = x_er + jnp.sum(weighted[:, :sp.vn], axis=1)
            x_ec = jnp.sum(x_ec * m[:, None, :, None], axis=2)  # (b, vn+lq, nx)
            x_ec = sp_gather_rows(x_ec, sp)                    # (b, vn+l, nx)
        else:
            x_er = jnp.sum(x_er * m[:, :, None, None], axis=1)
            x_ec = jnp.sum(x_ec * m[:, None, :, None], axis=2)
        m_sum = jnp.sum(m, axis=1)[:, None, None]
        x_h_n = jnp.where(m_sum > 0, (x_er + x_ec) / jnp.where(m_sum > 0, m_sum, 1.0),
                          jnp.zeros((), x_h.dtype))

    x_e_n = None
    if cfg.node2edge_xtalk > 0.0:
        hn = x_h.shape[-1]
        nx_s = round(cfg.node2edge_xtalk * hn / cfg.ffn_multiplier)
        nx_t = hn - nx_s * 2
        x_hr, x_hc, x_h = jnp.split(x_h, [nx_s, 2 * nx_s], axis=2)
        if sp is not None:
            x_hr = sp_take_rows(x_hr, sp)
        x_e_n = x_hr[:, :, None, :] + x_hc[:, None, :, :]

    if x_h_n is not None:
        x_h = jnp.concatenate([x_h, x_h_n], axis=-1)
    if x_e_n is not None:
        x_e = jnp.concatenate([x_e, x_e_n], axis=-1)
    return x_h, x_e


def ffn_block(p, cfg, norm_node, norm_edge, h, e, node_mask, training, rng, sp,
              skip_edge: bool = False):
    """Dual FFN with optional cross-talk (`graph_xformer_model_base.py:309-324`).
    Returns (h, e, stats_updates). `skip_edge` when the fused edge block already
    applied the edge-side FFN."""
    updates = {}
    xtalk_flag = cfg.node2edge_xtalk > 0.0 or cfg.edge2node_xtalk > 0.0
    act = cfg.activation
    edge_stream = (cfg.edge_channel_type in ("residual", "constrained")
                   and not skip_edge)

    y_h = h
    x_h = h
    if not cfg.add_n_norm:
        x_h, upd = norm_node(p["node_ffn"]["norm"], x_h, training)
        if upd:
            updates[("node_ffn", "norm")] = upd
    x_h = dense(p["node_ffn"]["lr1"], x_h)
    if not xtalk_flag:
        x_h = activation(act, x_h)

    if edge_stream:
        y_e = e
        x_e = e
        if not cfg.add_n_norm:
            x_e, upd = norm_edge(p["edge_ffn"]["norm"], x_e, training)
            if upd:
                updates[("edge_ffn", "norm")] = upd
        x_e = dense(p["edge_ffn"]["lr1"], x_e)
        if not xtalk_flag:
            x_e = activation(act, x_e)

        x_h, x_e = _xtalk(cfg, x_h, x_e, node_mask, sp) if xtalk_flag \
            else (x_h, x_e)

        if xtalk_flag:
            x_e = activation(act, x_e)
        x_e = dense(p["edge_ffn"]["lr2"], x_e)
        if cfg.edge_dropout > 0 and training:
            if sp is not None:
                x_e = sp_dropout_rows(x_e, cfg.edge_dropout, training,
                                      fold_rng(rng, 4), sp)
            else:
                x_e = dropout(x_e, cfg.edge_dropout, training, fold_rng(rng, 4))
        e = x_e + y_e
        if cfg.add_n_norm:
            e, upd = norm_edge(p["edge_ffn"]["norm"], e, training)
            if upd:
                updates[("edge_ffn", "norm")] = upd

    if xtalk_flag:
        x_h = activation(act, x_h)
    x_h = dense(p["node_ffn"]["lr2"], x_h)
    if cfg.node_dropout > 0 and training:
        x_h = dropout(x_h, cfg.node_dropout, training, fold_rng(rng, 5))
    h = x_h + y_h
    if cfg.add_n_norm:
        h, upd = norm_node(p["node_ffn"]["norm"], h, training)
        if upd:
            updates[("node_ffn", "norm")] = upd

    return h, e, updates


# ------------------------------------------------------------------- one full layer


def layer_forward(p, cfg, h, e, node_mask, edge_mask, training, rng, sp,
                  capture, layer_idx: int):
    """Attention sub-layer + FFN sub-layer (`graph_xformer_model_base.py:336-341`).
    Returns (h, e, node_repr, edge_repr, stats_updates, analysis) — pure, so it can
    be wrapped in `jax.checkpoint` for rematerialization."""
    analysis = {}
    tag = f"{layer_idx:0>2d}"
    rng_a = None if rng is None else fold_rng(rng, 2 * layer_idx)
    rng_f = None if rng is None else fold_rng(rng, 2 * layer_idx + 1)
    norm_node = make_norm(cfg.node_normalization)
    norm_edge = make_norm(cfg.edge_normalization, sp)

    from ..ops.fused_layer_pallas import can_fuse_layer, fused_layer_apply
    if (e is not None
            and can_fuse_layer(cfg, training, sp, capture, e.shape[1])
            and (cfg.edge_channel_type != "constrained"
                 or edge_mask is not None)):
        # whole-layer megakernel: edge pre-LN -> gates/bias -> attention ->
        # dense_edge_r + residual -> edge-FFN, one VMEM pass. The node-stream
        # denses stay in XLA (they are (b, l, w)-sized and fuse well there).
        y_h = h
        h_n, _ = norm_node(p["norm_mha"], h, training)   # pre-LN (guaranteed)
        qkv = dense(p["dense_qkv"], h_n)
        e, v_att = fused_layer_apply(p, cfg, e, qkv, node_mask, edge_mask,
                                     training, rng_a)
        h_mha = dense(p["dense_mha"], v_att)
        if cfg.node_dropout > 0 and training:
            h_mha = dropout(h_mha, cfg.node_dropout, training,
                            fold_rng(rng_a, 2))
        h = h_mha + y_h
        h, _, upd_f = ffn_block(p, cfg, norm_node, norm_edge, h, None,
                                node_mask, training, rng_f, sp,
                                skip_edge=True)
        return h, e, None, None, upd_f, analysis

    fuse_edge = can_fuse_edge_block(cfg, training, sp, capture)
    h, e, node_repr, edge_repr, upd_a = edge_update(
        p, cfg, norm_node, norm_edge, h, e, node_mask, edge_mask,
        training, rng_a, sp, capture, analysis, tag,
        defer_edge_tail=fuse_edge)
    if fuse_edge:
        from ..ops.edge_block_pallas import edge_block_apply
        h_hat, y_e = e
        e = edge_block_apply(p, h_hat, y_e)
        h, _, upd_f = ffn_block(p, cfg, norm_node, norm_edge, h, None,
                                node_mask, training, rng_f, sp,
                                skip_edge=True)
    else:
        h, e, upd_f = ffn_block(p, cfg, norm_node, norm_edge, h, e, node_mask,
                                training, rng_f, sp)
    updates = {**upd_a, **upd_f}
    return h, e, node_repr, edge_repr, updates, analysis


def can_fuse_edge_block(cfg, training: bool, sp, capture: bool) -> bool:
    """The fused Pallas edge block applies to the pre-LN LayerNorm residual edge
    channel without dropout or cross-talk (see ops/edge_block_pallas.py).
    edge_width >= 64: the kernel's flattened (b*l*l, ew) operands are lane-
    padded to 128 in HBM by the custom-call layout, so narrow edge channels
    (ew=8: 16x padding, measured 33GB at the PATTERN shape) are structurally
    unsupportable — the kernel's measured win region is ew >= 128 anyway."""
    return (getattr(cfg, "fused_edge_block", False)
            and cfg.edge_width >= 64
            and sp is None and not capture
            and cfg.edge_channel_type in ("residual", "constrained")
            and not cfg.add_n_norm
            and cfg.edge_normalization == "layer"
            and not (training and cfg.edge_dropout > 0)
            and cfg.node2edge_xtalk == 0.0 and cfg.edge2node_xtalk == 0.0)
