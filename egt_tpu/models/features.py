"""Feature embeddings and structural encoders.

Functional equivalents of the reference's feature mixins and embedding layers:

- -1-masked token embeddings (`lib/base/xformer_layers/masking.py:5-43`): ids are
  shifted by +1 so -1 padding hits the (learned but masked-out) row 0.
- dense-feature embeddings (`lib/models/mnist/dc.py:64-77`): Keras `Masking` zeroes
  rows whose every feature equals the mask value, then a Dense projects them.
- multi-column token embeddings (OGB atom/bond features): one offset-concatenated
  table, summed over columns — the EGT-large / PCQM4Mv2 input path (beyond the TF
  reference, which defers this task to its companion repo).
- adjacency hop stacking (`lib/models/graph_model_base.py:101-125`), with a
  sequence-parallel variant that all-gathers the previous hop's row shard over ICI.
- SVD / eigenvector positional encodings incl. train-time random sign flips
  (`graph_model_base.py:322-349,390-414`; `lib/base/xformer_layers/misc.py:53-94`).
- pairwise node->edge maps (`lib/base/xformer_layers/pairwise_op.py:32-70`).
- virtual node / edge embeddings (`lib/base/graph_layers/virtual_nodes.py:8-110`).
- degree one-hot and edge-feature diffusion encoders
  (`graph_model_base.py:144-206`, capability only — unused by shipped configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------- initializers


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def uniform_05(key, shape, dtype=jnp.float32):
    """Keras 'uniform' initializer: U(-0.05, 0.05) (embeddings, VN embeddings)."""
    return jax.random.uniform(key, shape, dtype, -0.05, 0.05)


def dense_params(key, in_dim, out_dim):
    return {"kernel": glorot_uniform(key, (in_dim, out_dim)),
            "bias": jnp.zeros((out_dim,), jnp.float32)}


def dense_params_uniform(key, in_dim, out_dim):
    return {"kernel": uniform_05(key, (in_dim, out_dim)),
            "bias": jnp.zeros((out_dim,), jnp.float32)}


def embedding_params(key, vocab, dim):
    return {"table": uniform_05(key, (vocab, dim))}


def dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


# ----------------------------------------------------------------------- embeddings


# Below this vocab size, embedding lookups go through a one-hot matmul: the
# table GRADIENT then becomes a GEMM instead of a scatter-add — profiling showed
# the b*l*l-index scatter into the tiny edge-feature table dominating the train
# step (~40% of device time at the ZINC bench shape).
_ONEHOT_VOCAB_MAX = 64


def token_embed(p, ids):
    """-1-masked token lookup: table[ids + 1] (`masking.py:35-43`)."""
    table = p["table"]
    idx = ids.astype(jnp.int32) + 1
    if table.shape[0] <= _ONEHOT_VOCAB_MAX:
        oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
        return oh @ table
    return jnp.take(table, idx, axis=0)


def multi_token_embed(p, ids, vocab_sizes):
    """Multi-column tokens: per-column lookups into one offset-concatenated table
    (row 0 is the shared mask row), summed over columns."""
    sizes = tuple(int(s) for s in vocab_sizes)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    idx = ids.astype(jnp.int32) + 1 + jnp.asarray(offsets)  # -1 -> 0 everywhere? no:
    # a masked column would land on a non-zero offset; graphs pad whole nodes, so
    # gate the lookup on the node-validity of column 0 instead:
    valid = (ids[..., :1] >= 0)
    idx = jnp.where(valid, idx, 0)
    table = p["table"]
    if table.shape[0] <= _ONEHOT_VOCAB_MAX:
        oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
        return jnp.einsum("...cv,vd->...d", oh, table)
    emb = jnp.take(table, idx, axis=0)                      # (..., C, dim)
    return emb.sum(axis=-2)


def masked_dense_embed(p, x, mask_value=-1.0):
    """Keras Masking + Dense: rows whose features all equal `mask_value` are zeroed
    before the projection (`mnist/dc.py:64-77`)."""
    valid = jnp.any(x != mask_value, axis=-1, keepdims=True)
    return dense(p, x * valid.astype(x.dtype))


# -------------------------------------------------------------- adjacency structure


def stack_hops(adj, upto_hop: int, clip_hops: bool = True):
    """[A, clip(A@A), ...] stacked on a new trailing axis
    (`graph_model_base.py:101-118`). `upto_hop == 1` is just A[..., None]."""
    hops = [adj]
    hop = adj
    for _ in range(upto_hop - 1):
        hop = adj @ hop
        if clip_hops:
            hop = jnp.clip(hop, 0.0, 1.0)
        hops.append(hop)
    return jnp.stack(hops, axis=-1)


def stack_hops_sp(adj_rows, upto_hop: int, axis: str, clip_hops: bool = True,
                  include_xpose: bool = False, index=None, lq: int | None = None):
    """Row-sharded hop stacking: each hop's local rows need the previous hop's FULL
    matrix, so the row shard is all-gathered over the mesh axis per hop. With
    `include_xpose`, each hop's transpose rows are sliced out of the gathered full
    hop (transpose rows = full columns) and concatenated on the hop axis, matching
    `graph_model_base.py:120-122`."""
    hops = [adj_rows]
    hops_full = []
    hop_rows = adj_rows
    for _ in range(upto_hop - 1):
        hop_full = jax.lax.all_gather(hop_rows, axis, axis=1, tiled=True)
        hops_full.append(hop_full)
        hop_rows = adj_rows @ hop_full
        if clip_hops:
            hop_rows = jnp.clip(hop_rows, 0.0, 1.0)
        hops.append(hop_rows)
    stacked = jnp.stack(hops, axis=-1)
    if not include_xpose:
        return stacked
    hops_full.append(jax.lax.all_gather(hop_rows, axis, axis=1, tiled=True))
    xpose_rows = [
        jax.lax.dynamic_slice_in_dim(jnp.swapaxes(hf, 1, 2), index * lq, lq, 1)
        for hf in hops_full
    ]
    return jnp.concatenate([stacked, jnp.stack(xpose_rows, axis=-1)], axis=-1)


def distance_targets(adj, distance_target: int):
    """k-hop reachability counts: round(sum_k clip(A^k, 0, 1)) as int32 — the
    auxiliary distance-prediction target (`graph_model_base.py:66-76`)."""
    hops = [adj]
    hop = adj
    for _ in range(distance_target - 1):
        hop = jnp.clip(adj @ hop, 0.0, 1.0)
        hops.append(hop)
    return jnp.round(sum(hops)).astype(jnp.int32)


def distance_targets_sp(adj_rows, distance_target: int, axis: str):
    """Row-sharded distance targets: per-hop all-gather, like `stack_hops_sp`."""
    total = adj_rows
    hop_rows = adj_rows
    for _ in range(distance_target - 1):
        hop_full = jax.lax.all_gather(hop_rows, axis, axis=1, tiled=True)
        hop_rows = jnp.clip(adj_rows @ hop_full, 0.0, 1.0)
        total = total + hop_rows
    return jnp.round(total).astype(jnp.int32)


def degree_encoding(adj, max_degree: int, bidir: bool):
    """One-hot clipped in/out degrees (`graph_model_base.py:149-171`)."""
    in_deg = jnp.minimum(jnp.sum(adj, axis=1), max_degree).astype(jnp.int32)
    in_oh = jax.nn.one_hot(in_deg, max_degree + 1, dtype=jnp.float32)
    if not bidir:
        return in_oh
    out_deg = jnp.minimum(jnp.sum(adj, axis=2), max_degree).astype(jnp.int32)
    out_oh = jax.nn.one_hot(out_deg, max_degree + 1, dtype=jnp.float32)
    return jnp.concatenate([in_oh, out_oh], axis=-1)


def degree_encoding_sp(adj_rows, max_degree: int, bidir: bool, axis: str):
    """Degree one-hots from a row shard: in-degrees (column sums) psum over
    shards; out-degrees (row sums) are local rows, all-gathered. Feeds the full
    (replicated) node stream."""
    in_deg = jax.lax.psum(jnp.sum(adj_rows, axis=1), axis)
    in_deg = jnp.minimum(in_deg, max_degree).astype(jnp.int32)
    in_oh = jax.nn.one_hot(in_deg, max_degree + 1, dtype=jnp.float32)
    if not bidir:
        return in_oh
    out_deg = jax.lax.all_gather(jnp.sum(adj_rows, axis=2), axis, axis=1,
                                 tiled=True)
    out_deg = jnp.minimum(out_deg, max_degree).astype(jnp.int32)
    out_oh = jax.nn.one_hot(out_deg, max_degree + 1, dtype=jnp.float32)
    return jnp.concatenate([in_oh, out_oh], axis=-1)


def edge_diffusion(e, adj, edge_mask2d, steps: int):
    """Column-normalized adjacency diffusion of the edge-feature embedding,
    concatenated over `steps` (`graph_model_base.py:178-195`)."""
    den = jnp.sum(adj, axis=1, keepdims=True)
    a_norm = jnp.where(den > 0, adj / jnp.where(den > 0, den, 1.0), 0.0)
    ed = e * edge_mask2d.astype(e.dtype)[..., None]
    outs = []
    for _ in range(steps):
        ed = jnp.einsum("bij,bjkl->bikl", a_norm, ed)
        outs.append(ed)
    return jnp.concatenate(outs, axis=-1)


def edge_diffusion_sp(e_rows, adj_rows, edge_mask2d_rows, steps: int, axis: str):
    """Row-sharded diffusion: the column normalizer is a psum of row-partial
    column sums; every step all-gathers the diffused rows so the next contraction
    sees the full node axis."""
    den = jax.lax.psum(jnp.sum(adj_rows, axis=1, keepdims=True), axis)
    a_norm = jnp.where(den > 0, adj_rows / jnp.where(den > 0, den, 1.0), 0.0)
    ed_rows = e_rows * edge_mask2d_rows.astype(e_rows.dtype)[..., None]
    outs = []
    for _ in range(steps):
        ed_full = jax.lax.all_gather(ed_rows, axis, axis=1, tiled=True)
        ed_rows = jnp.einsum("bij,bjkl->bikl", a_norm, ed_full)
        outs.append(ed_rows)
    return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------- positional encodings


def process_svd(p, svd, *, sel: int, model_width: int, transform: bool,
                random_neg: bool, training: bool, rng=None):
    """Truncate to `sel` pairs, (optionally) zero-pad to width/2, train-time random
    sign flip per feature (shared across U/V), flatten [U, V] on the feature axis,
    optional Dense transform (`graph_model_base.py:322-349`)."""
    v = svd[:, :, :sel, :]
    if not transform:
        pad = max(0, model_width // 2 - sel)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if random_neg and training:
        if rng is None:
            raise ValueError("random_neg requires an rng at training time")
        u = jax.random.uniform(rng, (v.shape[0], 1, v.shape[2], 1))
        v = v * jnp.where(u < 0.5, -1.0, 1.0).astype(v.dtype)
    flat = jnp.concatenate([v[..., 0], v[..., 1]], axis=-1)
    if transform:
        flat = dense(p, flat)
    return flat


def process_eig(p, eig, *, sel: int, model_width: int, transform: bool,
                random_neg: bool, training: bool, rng=None):
    """Eigenvector PE: truncate/pad or transform + random sign flip
    (`graph_model_base.py:390-414`)."""
    v = eig[:, :, :sel]
    if not transform:
        pad = max(0, model_width - sel)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    if random_neg and training:
        if rng is None:
            raise ValueError("random_neg requires an rng at training time")
        u = jax.random.uniform(rng, (v.shape[0], 1, v.shape[2]))
        v = v * jnp.where(u < 0.5, -1.0, 1.0).astype(v.dtype)
    if transform:
        v = dense(p, v)
    return v


# -------------------------------------------------------------------- pairwise maps


def pairwise_add(x):
    """PairwiseOp 'addsub' with add only, split on the last axis
    (`pairwise_op.py:32-54` + `zinc/dc.py:86-95`): split (b,l,2w) into row/col halves
    and broadcast-add into (b,l,l,w)."""
    w = x.shape[-1] // 2
    row, col = x[..., :w], x[..., w:]
    return row[:, :, None, :] + col[:, None, :, :]


def pairwise_add_sp(x, index, lq: int):
    """Row-sharded pairwise add: local row half against the full column half."""
    w = x.shape[-1] // 2
    row = jax.lax.dynamic_slice_in_dim(x[..., :w], index * lq, lq, 1)
    col = x[..., w:]
    return row[:, :, None, :] + col[:, None, :, :]


def pairwise_cat(row, col):
    """PairwiseOp 'cat' (`pairwise_op.py:56-70`): (b,l,w),(b,m,w) -> (b,l,m,2w)."""
    b, l, w = row.shape
    m = col.shape[1]
    rowb = jnp.broadcast_to(row[:, :, None, :], (b, l, m, w))
    colb = jnp.broadcast_to(col[:, None, :, :], (b, l, m, col.shape[-1]))
    return jnp.concatenate([rowb, colb], axis=-1)


# ------------------------------------------------------------------- virtual nodes


def prepend_virtual_nodes(h, vn_emb):
    """Prepend learned virtual-node rows (`virtual_nodes.py:41-50`)."""
    b = h.shape[0]
    tiled = jnp.broadcast_to(vn_emb[None].astype(h.dtype),
                             (b,) + vn_emb.shape)
    return jnp.concatenate([tiled, h], axis=1)


def prepend_virtual_edges_sp(e_rows, ve_emb):
    """Virtual-edge blocks for a row shard: every shard gets the FULL k virtual
    rows (replicated — they are query rows every shard must compute identically)
    plus the k virtual columns prepended to its local rows."""
    b, lq, l, w = e_rows.shape
    k = ve_emb.shape[0]
    emb = ve_emb.astype(e_rows.dtype)
    emb_r, emb_c = emb[None, :, None, :], emb[None, None, :, :]
    box = jnp.broadcast_to(0.5 * (emb_r + emb_c), (b, k, k, w))
    vn_rows = jnp.concatenate(
        [box, jnp.broadcast_to(emb_r, (b, k, l, w))], axis=2)   # (b, k, k+l, w)
    cols = jnp.broadcast_to(emb_c, (b, lq, k, w))
    local = jnp.concatenate([cols, e_rows], axis=2)             # (b, lq, k+l, w)
    return jnp.concatenate([vn_rows, local], axis=1)            # (b, k+lq, k+l, w)


def prepend_virtual_edges(e, ve_emb):
    """Prepend virtual row / col / 0.5(r+c) box blocks to the edge channel
    (`virtual_nodes.py:86-99`)."""
    b, l, _, w = e.shape
    k = ve_emb.shape[0]
    emb = ve_emb.astype(e.dtype)
    emb_r, emb_c = emb[None, :, None, :], emb[None, None, :, :]
    rows = jnp.broadcast_to(emb_r, (b, k, l, w))
    cols = jnp.broadcast_to(emb_c, (b, l + k, k, w))[:, k:]
    box = jnp.broadcast_to(0.5 * (emb_r + emb_c), (b, k, k, w))
    e = jnp.concatenate([rows, e], axis=1)               # (b, k+l, l, w)
    bc = jnp.concatenate([box, cols], axis=1)            # (b, k+l, k, w)
    return jnp.concatenate([bc, e], axis=2)              # (b, k+l, k+l, w)


def extend_edge_mask_for_vn(edge_mask, num_virtual_nodes: int):
    """VN rows/cols of a hard attention mask are always-on
    (`graph_model_base.py:254-267`)."""
    b, l, _, h = edge_mask.shape
    k = num_virtual_nodes
    row = jnp.ones((b, k, l, h), edge_mask.dtype)
    col = jnp.ones((b, l + k, k, h), edge_mask.dtype)
    m = jnp.concatenate([row, edge_mask], axis=1)
    return jnp.concatenate([col, m], axis=2)
