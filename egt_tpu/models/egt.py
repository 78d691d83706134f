"""The EGT attention op (einsum reference path).

Numerically mirrors the reference's `EGT` Keras layer (`lib/models/egt_layers.py:57-213`):
scaled QK^T logits, clipping to `clip_logits_value`, additive edge bias, additive
`(mask-1)*1e9` key masking applied to BOTH logits and gates (so padded keys contribute
zero attention AND zero degree), optional hard attention mask, train-time random
attention masking, softmax(axis=keys) x sigmoid gating, attention dropout, value
aggregation and the dynamic-centrality (degree) scaler with virtual-node rows pinned
to 1 (`egt_layers.py:123-136`).

Layout follows the reference: the flat qkv feature axis factors as [3, d, h]
(`egt_layers.py:69-76`); per-pair tensors are (b, l, l, h).

bfloat16: matmuls run on the MXU in the input dtype with float32 accumulation
(`preferred_element_type`), and the softmax/sigmoid chain is computed in float32
("f32 islands"), so reduced precision never touches the normalizer math.

Sequence-parallel (edge-partitioned) execution: the core accepts query rows that are
a row-shard of the key axis — q/e/gates carry l_q rows against l_k full keys — which
is how `parallel/edge_partition.py` runs the N x N grid sharded over the mesh's model
axis (softmax is over the full, unsharded key axis, so no online-softmax pass is
needed).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class EGTOutput(NamedTuple):
    v_att: jax.Array            # (b, l_q, d*h) aggregated values (degree-scaled)
    h_hat: jax.Array            # (b, l_q, l_k, h) logits+edge bias (edge-stream input)
    a_tild: jax.Array           # (b, l_q, l_k, h) post-gating attention matrix


def split_qkv(qkv: jax.Array, num_heads: int):
    """(b, l, 3*d*h) -> q, k, v each (b, l, d, h); the flat axis factors as [3, d, h]
    (`egt_layers.py:69-76`)."""
    b, l, f = qkv.shape
    if f % (3 * num_heads):
        raise ValueError(f"qkv feature dim {f} not divisible by 3*num_heads")
    d = f // (3 * num_heads)
    qkv = qkv.reshape(b, l, 3, d, num_heads)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def _qk_logits_vpu(q, k):
    """(b, lq, d, h) x (b, lk, d, h) -> (b, lq, lk, h) as an elementwise chain
    unrolled over the tiny contraction axis d. At EGT head dims (d = w/h = 8)
    the MXU dot wastes >90% of the systolic array AND forces the big per-pair
    tensor through a dot-friendly relayout; producing it on the VPU keeps it in
    the elementwise-optimal (batch-minor) layout with no copies."""
    d = q.shape[2]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    acc = qf[:, :, None, 0, :] * kf[:, None, :, 0, :]
    for di in range(1, d):
        acc = acc + qf[:, :, None, di, :] * kf[:, None, :, di, :]
    return acc


def _av_vpu(a, v):
    """(b, lq, lk, h) x (b, lk, d, h) -> (b, lq, d, h) as broadcast-multiply +
    reduce over the key axis — one fused reduce pass in `a`'s layout."""
    return jnp.sum(a.astype(jnp.float32)[:, :, :, None, :]
                   * v.astype(jnp.float32)[:, None, :, :, :], axis=2)


def egt_attention_core(
    q, k, v,                    # q: (b, l_q, d, h);  k, v: (b, l_k, d, h)
    e_bias,                     # (b, l_q, l_k, h) | None
    gates,                      # (b, l_q, l_k, h) | None  (pre-sigmoid)
    *,
    node_mask=None,             # (b, l_k) bool/0-1 key-validity mask
    attn_mask=None,             # (b, l_q, l_k, h) hard mask (added as (m-1)*1e9)
    clip_logits_value=(-5.0, 5.0),
    scale_degree=False,
    scaler_type="log",
    num_virtual_nodes=0,
    random_mask_prob=0.0,
    attn_dropout=0.0,
    training=False,
    rng=None,
    impl="einsum",              # einsum (MXU dots) | vpu (elementwise chains)
    chain_f32=True,             # False: per-pair chain tensors stay in the
    #   compute dtype (halves the HBM traffic of the logits/softmax/gate chain
    #   under bfloat16; the softmax denominator and the AV/QK accumulations
    #   remain f32 via preferred_element_type)
):
    if scale_degree and gates is None:
        raise ValueError("scale_degree requires gated attention")
    if scaler_type not in ("log", "linear"):
        raise ValueError(f"scaler_type must be log or linear, got {scaler_type}")
    if impl not in ("einsum", "vpu"):
        raise ValueError(f"attention impl must be einsum or vpu, got {impl!r}")

    b, lq, d, h = q.shape
    out_dtype = q.dtype
    ct = jnp.float32 if chain_f32 else out_dtype

    if impl == "vpu":
        a_hat = (_qk_logits_vpu(q, k) * (d ** -0.5)).astype(ct)
    else:
        # logits on the MXU, accumulated in f32 (`egt_layers.py:79`)
        a_hat = (jnp.einsum("bldh,bmdh->blmh", q, k,
                            preferred_element_type=jnp.float32)
                 * (d ** -0.5)).astype(ct)
    if clip_logits_value is not None:
        a_hat = jnp.clip(a_hat, clip_logits_value[0], clip_logits_value[1])
    h_hat = a_hat
    if e_bias is not None:
        h_hat = h_hat + e_bias.astype(ct)

    logits = h_hat
    g = None if gates is None else gates.astype(ct)
    if node_mask is not None:
        madd = (node_mask.astype(ct)[:, None, :, None] - 1.0) * jnp.asarray(
            1e9, ct)
        logits = logits + madd
        if g is not None:
            g = g + madd
    if attn_mask is not None:
        aadd = (attn_mask.astype(ct) - 1.0) * jnp.asarray(1e9, ct)
        logits = logits + aadd
        if g is not None:
            g = g + aadd

    if training and random_mask_prob > 0.0:
        if rng is None:
            raise ValueError("random_mask_prob requires an rng at training time")
        u = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
        rmask = jnp.where(u < random_mask_prob, NEG_INF, 0.0).astype(ct)
        logits = logits + rmask
        if g is not None:
            g = g + rmask

    a_tild = jax.nn.softmax(logits, axis=2)
    sg = None
    if g is not None:
        sg = jax.nn.sigmoid(g)
        a_tild = a_tild * sg

    a_drop = a_tild
    if training and attn_dropout > 0.0:
        if rng is None:
            raise ValueError("attn_dropout requires an rng at training time")
        drng = jax.random.fold_in(rng, 1)
        keep = 1.0 - attn_dropout
        keep_mask = jax.random.uniform(drng, a_tild.shape, dtype=jnp.float32) \
            >= attn_dropout
        a_drop = jnp.where(keep_mask, a_tild / keep, 0.0)

    if impl == "vpu":
        v_att = _av_vpu(a_drop.astype(out_dtype), v)
    else:
        v_att = jnp.einsum("blmh,bmdh->bldh", a_drop.astype(out_dtype), v,
                           preferred_element_type=jnp.float32)

    if scale_degree:
        degrees = jnp.sum(sg, axis=2, keepdims=True)        # (b, l_q, 1, h)
        scalers = jnp.log1p(degrees) if scaler_type == "log" else degrees
        if num_virtual_nodes > 0:
            non_vn = scalers[:, num_virtual_nodes:]
            scalers = jnp.pad(non_vn,
                              ((0, 0), (num_virtual_nodes, 0), (0, 0), (0, 0)),
                              constant_values=1.0)
        v_att = v_att * scalers

    v_att = v_att.astype(out_dtype).reshape(b, lq, d * h)
    # the reference returns the post-dropout attention matrix (`egt_layers.py:116-117`)
    return EGTOutput(v_att=v_att,
                     h_hat=h_hat.astype(out_dtype),
                     a_tild=a_drop.astype(out_dtype))


def egt_attention(
    qkv,                        # (b, l, 3*d*h)
    e_bias,                     # (b, l, l, h) | None
    gates,                      # (b, l, l, h) | None
    *,
    num_heads: int,
    node_mask=None,
    attn_mask=None,
    clip_logits_value=(-5.0, 5.0),
    scale_degree=False,
    scaler_type="log",
    num_virtual_nodes=0,
    random_mask_prob=0.0,
    attn_dropout=0.0,
    training=False,
    rng=None,
    impl="einsum",
    chain_f32=True,
) -> EGTOutput:
    """Full (unsharded) EGT attention from a fused qkv projection."""
    q, k, v = split_qkv(qkv, num_heads)
    return egt_attention_core(
        q, k, v, e_bias, gates,
        node_mask=node_mask, attn_mask=attn_mask,
        clip_logits_value=clip_logits_value,
        scale_degree=scale_degree, scaler_type=scaler_type,
        num_virtual_nodes=num_virtual_nodes,
        random_mask_prob=random_mask_prob, attn_dropout=attn_dropout,
        training=training, rng=rng, impl=impl, chain_f32=chain_f32)
