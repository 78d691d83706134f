"""Fused edge-channel post-attention block (TPU Pallas).

Fuses the entire edge-stream tail of one EGT layer —

    e_mid = h_hat @ W_r + b_r + e_res          (dense_edge_r + residual,
                                                `graph_xformer_model_base.py:214-218`)
    x     = LayerNorm(e_mid)                   (pre-LN FFN norm, `:230-233`)
    e_out = ELU(x @ W1 + b1) @ W2 + b2 + e_mid (edge FFN + residual, `:234-254`)

— into ONE VMEM pass. The unfused path round-trips five (b,l,l,*) tensors through
HBM per layer (e_mid, LN out, the 2x-width FFN hidden in and out, e_out); the fused
path reads h_hat + e_res once and writes e_out once. At the ZINC-500k bench shape
the edge stream is ~2/3 of step time and HBM-bound, so this is the dominant
traffic saver.

Every operation in the chain is ROW-wise (the LayerNorm normalizes the trailing
feature axis only), so the (b, l, l) pair axes are flattened into one row axis and
the grid simply blocks rows in large chunks — each program runs full-width GEMMs
over thousands of rows, keeping the MXU busy, instead of per-(batch, tile)
fragments. Matmuls run in the input dtype (bf16 native on the MXU) with f32
accumulation; LN statistics and the activation are computed in f32.

Backward: custom VJP that recomputes every intermediate from the saved (h_hat,
e_res) inputs — nothing bigger than the inputs is saved. Weight/bias/LN-scale
gradients accumulate in VMEM across the whole row grid (their output blocks map
every program to the same block, and the TPU grid is sequential, so the
accumulator stays resident).

Restrictions (callers fall back to the unfused path otherwise): pre-LN
(`add_n_norm=False`), LayerNorm edge normalization, no train-time edge dropout, no
FFN cross-talk.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-3  # Keras LayerNormalization default
_VMEM_BUDGET_ELEMS = 1_500_000  # ~6MB of f32 live per program (scoped limit 16MB)


def _pick_rows(n: int, h: int, ew: int, hidden: int) -> int:
    """Rows per program bounded by the live f32 footprint of the backward pass
    (~6 ew-wide + ~3 hidden-wide intermediates per row). Each width occupies
    full 128-element vector lanes in VMEM, so narrow feature dims (ew=8 on the
    SBM shapes) cost 128 lanes per row — without this rounding the picked
    block overflows the 16MB scoped-vmem stack limit."""
    lanes = lambda f: -(-f // 128) * 128
    per_row = lanes(h) + 6 * lanes(ew) + 3 * lanes(hidden)
    max_rows = max(8, (_VMEM_BUDGET_ELEMS // per_row) // 8 * 8)
    if n <= max_rows:
        return n
    for r in range(max_rows, 7, -8):
        if n % r == 0:
            return r
    return n


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mm(a, b, dims=None):
    """Matmul in the input dtype (bf16 hits the MXU natively) with f32 accumulate."""
    if dims is None:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _recompute_fwd(hh, er, w_r, b_r, gamma, beta, w1, b1, w2, b2):
    """Forward math on (R, *) row blocks; elementwise/LN in f32, GEMMs in the
    storage dtype. Returns the intermediates the backward pass needs."""
    dt = hh.dtype
    em = _mm(hh, w_r) + b_r + er.astype(jnp.float32)
    mu = jnp.mean(em, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(em - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    x = (em - mu) * rstd
    xn = gamma * x + beta
    pre = _mm(xn.astype(dt), w1) + b1
    # elu without expm1 (unsupported by the Mosaic TPU lowering)
    hid = jnp.where(pre > 0, pre, jnp.exp(jnp.minimum(pre, 0.0)) - 1.0)
    out = _mm(hid.astype(dt), w2) + b2 + em
    return em, x, rstd, xn, pre, hid, out


def _fwd_kernel(hh_ref, er_ref, w_r_ref, b_r_ref, gamma_ref, beta_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    *_, out = _recompute_fwd(
        hh_ref[...], er_ref[...], w_r_ref[...], b_r_ref[0],
        gamma_ref[0], beta_ref[0], w1_ref[...], b1_ref[0],
        w2_ref[...], b2_ref[0])
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(hh_ref, er_ref, w_r_ref, b_r_ref, gamma_ref, beta_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dhh_ref, der_ref, dw_r_ref, db_r_ref, dgamma_ref, dbeta_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref):
    hh = hh_ref[...]
    dt = hh.dtype
    w_r = w_r_ref[...]
    gamma = gamma_ref[0]
    w1 = w1_ref[...]
    w2 = w2_ref[...]

    em, x, rstd, xn, pre, hid, _ = _recompute_fwd(
        hh, er_ref[...], w_r, b_r_ref[0], gamma, beta_ref[0], w1, b1_ref[0],
        w2, b2_ref[0])

    g = g_ref[...].astype(jnp.float32)
    gdt = g.astype(dt)

    # out = hid @ w2 + b2 + em
    dhid = _mm(gdt, w2, dims=((1,), (1,)))
    hid_dt = hid.astype(dt)
    dw2 = _mm(hid_dt, gdt, dims=((0,), (0,)))
    db2 = jnp.sum(g, axis=0)[None]

    # hid = elu(pre): d/dpre = 1 (pre > 0) else exp(pre) = elu + 1
    dpre = dhid * jnp.where(pre > 0, 1.0, hid + 1.0)
    dpre_dt = dpre.astype(dt)
    xn_dt = xn.astype(dt)
    dw1 = _mm(xn_dt, dpre_dt, dims=((0,), (0,)))
    db1 = jnp.sum(dpre, axis=0)[None]
    dxn = _mm(dpre_dt, w1, dims=((1,), (1,)))

    # xn = gamma * x + beta
    dgamma = jnp.sum(dxn * x, axis=0)[None]
    dbeta = jnp.sum(dxn, axis=0)[None]
    dx = dxn * gamma

    # x = (em - mu) * rstd  (LayerNorm backward over the last axis)
    m1 = jnp.mean(dx, axis=-1, keepdims=True)
    m2 = jnp.mean(dx * x, axis=-1, keepdims=True)
    dem = (dx - m1 - x * m2) * rstd + g  # + residual path

    dem_dt = dem.astype(dt)
    dhh = _mm(dem_dt, w_r, dims=((1,), (1,)))
    dw_r = _mm(hh, dem_dt, dims=((0,), (0,)))
    db_r = jnp.sum(dem, axis=0)[None]

    dhh_ref[...] = dhh.astype(dhh_ref.dtype)
    der_ref[...] = dem.astype(der_ref.dtype)

    # the grid is sequential on TPU: the block-0-mapped accumulators stay
    # resident in VMEM across every row-block program
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw_r_ref, db_r_ref, dgamma_ref, dbeta_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    dw_r_ref[...] += dw_r
    db_r_ref[...] += db_r
    dgamma_ref[...] += dgamma
    dbeta_ref[...] += dbeta
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2


def _row_spec(r, f):
    return pl.BlockSpec((r, f), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _weight_specs(h, ew, hidden):
    return [_full_spec((h, ew)), _full_spec((1, ew)), _full_spec((1, ew)),
            _full_spec((1, ew)), _full_spec((ew, hidden)),
            _full_spec((1, hidden)), _full_spec((hidden, ew)),
            _full_spec((1, ew))]


@jax.custom_vjp
def _edge_block_rows(hh, er, w_r, b_r, gamma, beta, w1, b1, w2, b2):
    out, _ = _rows_fwd(hh, er, w_r, b_r, gamma, beta, w1, b1, w2, b2)
    return out


def _rows_fwd(hh, er, w_r, b_r, gamma, beta, w1, b1, w2, b2):
    n, h = hh.shape
    ew = er.shape[-1]
    hidden = w1.shape[-1]
    r = _pick_rows(n, h, ew, hidden)
    args2 = tuple(v[None] for v in (b_r, gamma, beta, b1, b2))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n // r,),
        in_specs=[_row_spec(r, h), _row_spec(r, ew)] + _weight_specs(h, ew,
                                                                     hidden),
        out_specs=_row_spec(r, ew),
        out_shape=jax.ShapeDtypeStruct((n, ew), er.dtype),
        interpret=_interpret(),
        name="edge_block_fwd",
    )(hh, er, w_r, args2[0], args2[1], args2[2], w1, args2[3], w2, args2[4])
    return out, (hh, er, w_r, b_r, gamma, beta, w1, b1, w2, b2)


def _rows_bwd(residuals, g):
    hh, er, w_r, b_r, gamma, beta, w1, b1, w2, b2 = residuals
    n, h = hh.shape
    ew = er.shape[-1]
    hidden = w1.shape[-1]
    r = _pick_rows(n, h, ew, hidden)
    args2 = tuple(v[None] for v in (b_r, gamma, beta, b1, b2))
    f32 = jnp.float32
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(n // r,),
        in_specs=[_row_spec(r, h), _row_spec(r, ew)]
        + _weight_specs(h, ew, hidden) + [_row_spec(r, ew)],
        out_specs=[_row_spec(r, h), _row_spec(r, ew)]
        + _weight_specs(h, ew, hidden),
        out_shape=[
            jax.ShapeDtypeStruct((n, h), hh.dtype),
            jax.ShapeDtypeStruct((n, ew), er.dtype),
            jax.ShapeDtypeStruct((h, ew), f32),
            jax.ShapeDtypeStruct((1, ew), f32),
            jax.ShapeDtypeStruct((1, ew), f32),
            jax.ShapeDtypeStruct((1, ew), f32),
            jax.ShapeDtypeStruct((ew, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, ew), f32),
            jax.ShapeDtypeStruct((1, ew), f32),
        ],
        interpret=_interpret(),
        name="edge_block_bwd",
    )(hh, er, w_r, args2[0], args2[1], args2[2], w1, args2[3], w2, args2[4], g)
    (dhh, der, dw_r, db_r, dgamma, dbeta, dw1, db1, dw2, db2) = outs
    return (dhh, der,
            dw_r.astype(w_r.dtype), db_r[0].astype(b_r.dtype),
            dgamma[0].astype(gamma.dtype), dbeta[0].astype(beta.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


_edge_block_rows.defvjp(_rows_fwd, _rows_bwd)


def fused_edge_block(h_hat, e_res, w_r, b_r, gamma, beta, w1, b1, w2, b2):
    """(b, l, l, h) x (b, l, l, ew) -> (b, l, l, ew); see module docstring."""
    b, l, _, h = h_hat.shape
    ew = e_res.shape[-1]
    n = b * l * l
    out = _edge_block_rows(
        h_hat.reshape(n, h), e_res.reshape(n, ew),
        w_r, b_r, gamma, beta, w1, b1, w2, b2)
    return out.reshape(b, l, l, ew)


def edge_block_apply(layer_params, h_hat, e_res):
    """Run the fused block from a model layer's params subtree
    (dense_edge_r + edge_ffn{norm, lr1, lr2})."""
    p = layer_params
    dt = e_res.dtype
    return fused_edge_block(
        h_hat.astype(dt), e_res,
        p["dense_edge_r"]["kernel"].astype(dt), p["dense_edge_r"]["bias"],
        p["edge_ffn"]["norm"]["gamma"], p["edge_ffn"]["norm"]["beta"],
        p["edge_ffn"]["lr1"]["kernel"].astype(dt), p["edge_ffn"]["lr1"]["bias"],
        p["edge_ffn"]["lr2"]["kernel"].astype(dt), p["edge_ffn"]["lr2"]["bias"])
