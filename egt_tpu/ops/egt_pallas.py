"""Fused EGT attention Pallas kernel (TPU).

Fuses the memory-bound chain of the EGT attention op — logit clipping, edge bias,
additive masks, train-time random attention masking, softmax x sigmoid gating,
attention dropout, value aggregation and degree accumulation — into a single VMEM
pass, eliminating the repeated HBM round-trips of the unfused path (the b,l,l,h
logits/softmax/gate intermediates).  Semantics match
`egt_tpu.models.egt.egt_attention` (which mirrors `lib/models/egt_layers.py:57-143`)
and are tested against it.

Layout: head-major. q,k,v are (b,h,l,d); the edge bias, gates and h_hat are
(b,h,l,l).  The surrounding layer produces/consumes these via head-major einsums so
no big-tensor transposes are required (see models/layers.py fused path).

Grid: (batch, head, q-blocks). Queries are tiled in blocks of up to _MAX_QL_ELEMS /
l rows so per-pair VMEM buffers stay bounded — graphs up to multi-thousand nodes
compile with the same kernel (K/V stay whole per program; softmax is over the full
key axis, so no online-softmax pass is needed). The q-block index maps dq/de/dg to
their row block, while dk/dv accumulate across q-blocks in VMEM (the q-block grid
axis is innermost, so the output block stays resident between steps).

Backward: custom VJP with a second kernel that recomputes softmax/sigmoid from the
saved `h_hat` output and REGENERATES the random-mask/dropout bits from the same
per-program PRNG seed (the seed folds in the q-block index, so forward and backward
draw identical bits per tile).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# per-pair VMEM buffers are (q_block, l); cap q_block * l so the ~6 live
# buffers stay well inside the 16MB scoped limit. The cap is calibrated for
# 2-byte storage (bf16); 4-byte dtypes halve it — at f32 l=512 the backward's
# live (qb, lk) buffers otherwise overflow the scoped-vmem stack.
_MAX_QL_ELEMS = 512 * 512


def _pick_q_block(lq: int, lk: int, itemsize: int = 2) -> int:
    """Query-row block: divides lq; per-pair buffers are (qb, lk).
    EGT_ATTN_QB overrides for tuning sweeps (tools/layerbench.py)."""
    import os
    qb_env = os.environ.get("EGT_ATTN_QB")
    if qb_env:
        return min(int(qb_env), lq)
    max_qb = max(8, (_MAX_QL_ELEMS * 2 // max(itemsize, 2)) // max(lk, 1))
    if lq <= max_qb:
        return lq
    for qb in range(max_qb, 7, -1):
        if lq % qb == 0:
            return qb
    return lq  # no suitable divisor: fall back to one block



def _prec(dtype):
    """f32 matmuls must be exact (the backward pass recomputes the clip gate from
    raw logits), so pin HIGHEST; bf16 inputs are single-pass exact on the MXU and
    Mosaic rejects an fp32 contract precision for them."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _uniform_from_bits(shape):
    """uint32 random bits -> uniform [0, 1) float32 without an integer->float cast
    (unsupported by Mosaic): pack 23 random mantissa bits under exponent 0 to get a
    float in [1, 2), then subtract 1."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    fbits = jax.lax.bitwise_or(mantissa, jnp.uint32(0x3F800000))
    return pltpu.bitcast(fbits, jnp.float32) - 1.0


def _make_uniform(seed_ref):
    """Per-(batch, head, q-block) uniform sampler. Uses the TPU hardware PRNG when
    compiled; falls back to threefry (ordinary jax.random, traceable on CPU) in
    interpret mode. Draws are indexed (0 = random mask, 1 = dropout) so the forward
    and backward kernels regenerate identical bits."""
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    q_idx = pl.program_id(2)
    if _interpret():
        base = jax.random.PRNGKey(seed_ref[0])
        for ix in (b_idx, h_idx, q_idx):
            base = jax.random.fold_in(base, ix)

        def uniform(shape, idx):
            return jax.random.uniform(jax.random.fold_in(base, idx), shape)
    else:
        # collision-free linear program encoding (a prime-weighted sum can
        # collide for distinct (b, h, q) triples)
        flat = (b_idx * pl.num_programs(1) + h_idx) * pl.num_programs(2) + q_idx
        pltpu.prng_seed(seed_ref[0] + flat)

        def uniform(shape, idx):
            del idx  # hardware PRNG draws sequentially in a fixed order
            return _uniform_from_bits(shape)

    return uniform


# ------------------------------------------------------------------------ forward


def _fwd_kernel(seed_ref, *refs, gated, has_full_mask, clip_lo, clip_hi,
                random_mask_prob, attn_dropout, training, scale):
    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    e_ref = next(it)
    g_ref = next(it) if gated else None
    madd_ref = next(it)                      # (1, l) row mask add
    maddf_ref = next(it) if has_full_mask else None
    vout_ref = next(it)
    hhat_ref = next(it)
    deg_ref = next(it) if gated else None

    stochastic = training and (random_mask_prob > 0.0 or attn_dropout > 0.0)
    uniform = _make_uniform(seed_ref) if stochastic else None

    q = q_ref[0, 0]                          # (qb, d)
    k = k_ref[0, 0]                          # (l, d)
    v = v_ref[0, 0]
    e = e_ref[0, 0]                          # (qb, l)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(q.dtype)) * scale
    if clip_lo is not None:
        logits = jnp.clip(logits, clip_lo, clip_hi)
    h_hat = logits + e.astype(jnp.float32)
    hhat_ref[0, 0] = h_hat.astype(hhat_ref.dtype)

    madd = madd_ref[0]                       # (1, l) -> broadcast over queries
    lm = h_hat + madd
    if has_full_mask:
        lm = lm + maddf_ref[0]
    if gated:
        gm = g_ref[0, 0].astype(jnp.float32) + madd
        if has_full_mask:
            gm = gm + maddf_ref[0]

    if training and random_mask_prob > 0.0:
        u = uniform(lm.shape, 0)
        rm = jnp.where(u < random_mask_prob, NEG_INF, 0.0)
        lm = lm + rm
        if gated:
            gm = gm + rm

    s = jax.nn.softmax(lm, axis=-1)
    if gated:
        sg = jax.nn.sigmoid(gm)
        a = s * sg
        deg_ref[0, 0] = jnp.sum(sg, axis=-1)[:, None]
    else:
        a = s

    if training and attn_dropout > 0.0:
        u2 = uniform(a.shape, 1)
        keep = 1.0 - attn_dropout
        a = jnp.where(u2 >= attn_dropout, a / keep, 0.0)

    vout_ref[0, 0] = jnp.dot(a.astype(v.dtype), v,
                             preferred_element_type=jnp.float32,
                             precision=_prec(v.dtype)).astype(vout_ref.dtype)


# ------------------------------------------------------------------------ backward


def _bwd_kernel(seed_ref, *refs, gated, has_full_mask, clip_lo, clip_hi,
                random_mask_prob, attn_dropout, training, scale):
    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    g_ref = next(it) if gated else None
    madd_ref = next(it)
    maddf_ref = next(it) if has_full_mask else None
    hhat_ref = next(it)
    gv_ref = next(it)                        # cotangent of v_att (qb, d)
    gh_ref = next(it)                        # cotangent of h_hat (qb, l)
    gdeg_ref = next(it) if gated else None   # cotangent of degrees (qb,)
    dq_ref = next(it)
    dk_ref = next(it)                        # accumulated across q-blocks
    dv_ref = next(it)                        # accumulated across q-blocks
    de_ref = next(it)
    dg_ref = next(it) if gated else None

    stochastic = training and (random_mask_prob > 0.0 or attn_dropout > 0.0)
    uniform = _make_uniform(seed_ref) if stochastic else None

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    h_hat = hhat_ref[0, 0].astype(jnp.float32)
    madd = madd_ref[0]

    lm = h_hat + madd
    if has_full_mask:
        lm = lm + maddf_ref[0]
    if gated:
        gm = g_ref[0, 0].astype(jnp.float32) + madd
        if has_full_mask:
            gm = gm + maddf_ref[0]

    # regenerate random masks in the same draw order as the forward kernel
    if training and random_mask_prob > 0.0:
        u = uniform(lm.shape, 0)
        rm = jnp.where(u < random_mask_prob, NEG_INF, 0.0)
        lm = lm + rm
        if gated:
            gm = gm + rm

    s = jax.nn.softmax(lm, axis=-1)
    if gated:
        sg = jax.nn.sigmoid(gm)
        a = s * sg
    else:
        a = s

    if training and attn_dropout > 0.0:
        u2 = uniform(a.shape, 1)
        keep = 1.0 - attn_dropout
        dmask = (u2 >= attn_dropout).astype(jnp.float32) / keep
        a_d = a * dmask
    else:
        dmask = None
        a_d = a

    gv = gv_ref[0, 0]
    gh = gh_ref[0, 0].astype(jnp.float32)

    dA_d = jax.lax.dot_general(gv, v, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec(v.dtype))  # (qb, l)
    dA = dA_d * dmask if dmask is not None else dA_d

    if gated:
        dS = dA * sg
        dsg = dA * s + gdeg_ref[0, 0].reshape(-1)[:, None]
        dG = dsg * sg * (1.0 - sg)
        dg_ref[0, 0] = dG.astype(dg_ref.dtype)
    else:
        dS = dA

    dL = s * (dS - jnp.sum(dS * s, axis=-1, keepdims=True))
    dH = dL + gh
    de_ref[0, 0] = dH.astype(de_ref.dtype)

    # clip gradient: recompute raw scaled logits, gate where inside [lo, hi]
    raw = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_prec(q.dtype)) * scale
    if clip_lo is not None:
        inside = jnp.logical_and(raw >= clip_lo, raw <= clip_hi)
        draw = jnp.where(inside, dH, 0.0)
    else:
        draw = dH

    draw_dt = draw.astype(k.dtype)
    dq_ref[0, 0] = (jnp.dot(draw_dt, k, preferred_element_type=jnp.float32,
                            precision=_prec(k.dtype))
                    * scale).astype(dq_ref.dtype)

    dk_part = jax.lax.dot_general(
        draw_dt, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(q.dtype)) * scale
    dv_part = jax.lax.dot_general(
        a_d.astype(gv.dtype), gv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_prec(gv.dtype))

    # q-blocks are the innermost grid axis: the (i, j, 0, 0)-mapped dk/dv blocks
    # stay resident in VMEM across blocks, so accumulate in place
    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk_part
    dv_ref[0, 0] += dv_part


# --------------------------------------------------------------------- dispatchers


def _specs(lk, d, qb):
    """BlockSpecs for the (b, h, nq) grid. Queries may be a row shard (lq < lk,
    edge partitioning): per-pair blocks are (qb, lk), K/V stay whole."""
    def bh(shape, index_map):
        return pl.BlockSpec((1, 1) + shape, index_map, memory_space=pltpu.VMEM)

    q_blk = bh((qb, d), lambda i, j, qi, *_: (i, j, qi, 0))
    kv_full = bh((lk, d), lambda i, j, qi, *_: (i, j, 0, 0))
    ql_blk = bh((qb, lk), lambda i, j, qi, *_: (i, j, qi, 0))
    madd_spec = pl.BlockSpec((1, 1, lk), lambda i, j, qi, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    maddf_spec = pl.BlockSpec((1, qb, lk), lambda i, j, qi, *_: (i, qi, 0),
                              memory_space=pltpu.VMEM)
    deg_spec = pl.BlockSpec((1, 1, qb, 1), lambda i, j, qi, *_: (i, j, qi, 0),
                            memory_space=pltpu.VMEM)
    kv_acc = bh((lk, d), lambda i, j, qi, *_: (i, j, 0, 0))
    return q_blk, kv_full, ql_blk, madd_spec, maddf_spec, deg_spec, kv_acc


class _CoreOut(NamedTuple):
    v_att: jax.Array      # (b, h, l, d)
    h_hat: jax.Array      # (b, h, l, l)
    degrees: jax.Array | None  # (b, h, l, 1)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11))
def _egt_core(q, k, v, e, g, masks, seed, clip, random_mask_prob,
              attn_dropout, training, gated):
    out, _ = _egt_core_fwd(q, k, v, e, g, masks, seed, clip, random_mask_prob,
                           attn_dropout, training, gated)
    return out


def _egt_core_fwd(q, k, v, e, g, masks, seed, clip, random_mask_prob,
                  attn_dropout, training, gated):
    madd, maddf = masks
    b, h, lq, d = q.shape
    lk = k.shape[2]
    has_full_mask = maddf is not None
    clip_lo, clip_hi = (clip if clip is not None else (None, None))
    scale = d ** -0.5
    qb = _pick_q_block(lq, lk, q.dtype.itemsize)

    q_blk, kv_full, ql_blk, madd_spec, maddf_spec, deg_spec, _ = _specs(lk, d, qb)

    in_specs = [q_blk, kv_full, kv_full, ql_blk]
    inputs = [q, k, v, e]
    if gated:
        in_specs.append(ql_blk)
        inputs.append(g)
    in_specs.append(madd_spec)
    inputs.append(madd)
    if has_full_mask:
        in_specs.append(maddf_spec)
        inputs.append(maddf)

    dt = q.dtype
    out_shape = [
        jax.ShapeDtypeStruct((b, h, lq, d), dt),
        jax.ShapeDtypeStruct((b, h, lq, lk), dt),
    ]
    out_specs = [q_blk, ql_blk]
    if gated:
        out_shape.append(jax.ShapeDtypeStruct((b, h, lq, 1), jnp.float32))
        out_specs.append(deg_spec)

    kernel = functools.partial(
        _fwd_kernel, gated=gated, has_full_mask=has_full_mask,
        clip_lo=clip_lo, clip_hi=clip_hi, random_mask_prob=random_mask_prob,
        attn_dropout=attn_dropout, training=training, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, lq // qb),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
        name="egt_attention_fwd",
    )(seed, *inputs)

    if gated:
        v_att, h_hat, deg = outs
    else:
        v_att, h_hat = outs
        deg = None
    out = _CoreOut(v_att, h_hat, deg)
    residuals = (q, k, v, g, madd, maddf, seed, h_hat)
    return out, residuals


def _egt_core_bwd_impl(clip, random_mask_prob, attn_dropout, training, gated,
                       residuals, cotangents):
    q, k, v, g, madd, maddf, seed, h_hat = residuals
    gv, gh, gdeg = cotangents
    b, h, lq, d = q.shape
    lk = k.shape[2]
    has_full_mask = maddf is not None
    clip_lo, clip_hi = (clip if clip is not None else (None, None))
    scale = d ** -0.5
    qb = _pick_q_block(lq, lk, q.dtype.itemsize)

    q_blk, kv_full, ql_blk, madd_spec, maddf_spec, deg_spec, kv_acc = _specs(
        lk, d, qb)

    in_specs = [q_blk, kv_full, kv_full]
    inputs = [q, k, v]
    if gated:
        in_specs.append(ql_blk)
        inputs.append(g)
    in_specs.append(madd_spec)
    inputs.append(madd)
    if has_full_mask:
        in_specs.append(maddf_spec)
        inputs.append(maddf)
    in_specs.extend([ql_blk, q_blk, ql_blk])
    inputs.extend([h_hat, gv, gh])
    if gated:
        if gdeg is None:
            gdeg = jnp.zeros((b, h, lq, 1), jnp.float32)
        in_specs.append(deg_spec)
        inputs.append(gdeg)

    dt = q.dtype
    out_shape = [
        jax.ShapeDtypeStruct((b, h, lq, d), dt),           # dq
        jax.ShapeDtypeStruct((b, h, lk, d), jnp.float32),  # dk (f32 accumulator)
        jax.ShapeDtypeStruct((b, h, lk, d), jnp.float32),  # dv (f32 accumulator)
        jax.ShapeDtypeStruct((b, h, lq, lk), dt),          # de
    ]
    out_specs = [q_blk, kv_acc, kv_acc, ql_blk]
    if gated:
        out_shape.append(jax.ShapeDtypeStruct((b, h, lq, lk), dt))
        out_specs.append(ql_blk)

    kernel = functools.partial(
        _bwd_kernel, gated=gated, has_full_mask=has_full_mask,
        clip_lo=clip_lo, clip_hi=clip_hi, random_mask_prob=random_mask_prob,
        attn_dropout=attn_dropout, training=training, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, lq // qb),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
        name="egt_attention_bwd",
    )(seed, *inputs)

    if gated:
        dq, dk, dv, de, dg = outs
    else:
        dq, dk, dv, de = outs
        dg = None
    dk = dk.astype(dt)  # cotangents must match the primal dtype
    dv = dv.astype(dt)
    # grads for (q, k, v, e, g, masks, seed) — masks/seed are non-differentiable
    import numpy as np
    dmadd = jnp.zeros_like(madd)
    dmaddf = None if maddf is None else jnp.zeros_like(maddf)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, de, dg, (dmadd, dmaddf), dseed


def _bwd_wrapper(clip, random_mask_prob, attn_dropout, training, gated,
                 residuals, cotangents):
    return _egt_core_bwd_impl(clip, random_mask_prob, attn_dropout, training,
                              gated, residuals, cotangents)


_egt_core.defvjp(_egt_core_fwd, _bwd_wrapper)


# ------------------------------------------------------------------- public entry


class FusedAttentionOutput(NamedTuple):
    v_att: jax.Array          # (b, l, d*h) — degree-scaled, ready for out-proj
    h_hat: jax.Array          # (b, h, l, l) head-major (for the edge stream)


def egt_attention_fused(
    q, k, v,                       # q: (b, h, lq, d); k, v: (b, h, lk, d)
    e_bias,                        # (b, h, lq, lk)
    gates,                         # (b, h, lq, lk) | None
    *,
    node_mask=None,                # (b, lk) bool
    attn_mask_hm=None,             # (b, lq, lk) 0/1 hard mask (head-shared)
    clip_logits_value=(-5.0, 5.0),
    scale_degree=False,
    scaler_type="log",
    num_virtual_nodes=0,
    random_mask_prob=0.0,
    attn_dropout=0.0,
    training=False,
    rng=None,
) -> FusedAttentionOutput:
    """Fused path with the exact semantics of `egt.egt_attention` (head-major I/O).

    Rectangular grids are supported: under edge partitioning the queries are a row
    shard (lq = vn + l/shards < lk) while K/V stay full; per-pair tensors carry
    only the local rows. With virtual nodes the replicated VN rows lead every
    shard's row block, so the degree-scaler VN pinning below indexes shard-local
    rows identically to the full case."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    gated = gates is not None
    if scale_degree and not gated:
        raise ValueError("scale_degree requires gated attention")

    if node_mask is None:
        madd = jnp.zeros((b, 1, lk), jnp.float32)
    else:
        madd = ((node_mask.astype(jnp.float32) - 1.0) * 1e9)[:, None, :]
    maddf = None
    if attn_mask_hm is not None:
        maddf = (attn_mask_hm.astype(jnp.float32) - 1.0) * 1e9

    stochastic = training and (random_mask_prob > 0.0 or attn_dropout > 0.0)
    if stochastic:
        if rng is None:
            raise ValueError("training stochasticity requires an rng")
        seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    clip = tuple(clip_logits_value) if clip_logits_value is not None else None
    dt = q.dtype
    out = _egt_core(q, k.astype(dt), v.astype(dt), e_bias.astype(dt),
                    gates.astype(dt) if gated else None,
                    (madd, maddf), seed,
                    clip, float(random_mask_prob), float(attn_dropout),
                    bool(training), gated)
    v_att, h_hat, degrees = out

    if scale_degree:
        degrees = degrees[..., 0]                # (b, h, lq, 1) -> (b, h, lq)
        scalers = jnp.log1p(degrees) if scaler_type == "log" else degrees
        if num_virtual_nodes > 0:
            non_vn = scalers[:, :, num_virtual_nodes:]
            scalers = jnp.pad(non_vn, ((0, 0), (0, 0), (num_virtual_nodes, 0)),
                              constant_values=1.0)
        v_att = v_att * scalers[..., None].astype(v_att.dtype)

    # (b, h, lq, d) -> (b, lq, d, h) -> (b, lq, d*h): matches the reference's
    # [d, h]-ordered head flattening (`egt_layers.py:139-141`).
    v_flat = jnp.transpose(v_att, (0, 2, 3, 1)).reshape(b, lq, d * h)
    return FusedAttentionOutput(v_att=v_flat, h_hat=h_hat)
