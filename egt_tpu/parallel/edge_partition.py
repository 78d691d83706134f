"""Edge-partitioned (sequence-parallel) model execution via shard_map.

This is the beyond-reference scale-out path for large graphs (SURVEY.md §2.9, §5.7):
the N x N attention grid and edge channel are sharded by query-node rows across the
mesh's model axis; K/V node blocks are all-gathered over ICI inside the attention op
(`models/egt.py`), hop-stacking gathers rows iteratively
(`models/features.py:stack_hops_sp`), and graph-level pooling psums partial sums.

Memory per device for the dominant b,l,l,* tensors drops by the shard count, which is
what makes graphs far beyond TSP's ~500 nodes trainable.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from .mesh import MODEL_AXIS

try:  # jax >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

# batch fields whose second axis is the (sharded) query-node row axis
_ROW_SHARDED = ("graph_matrix", "feature_matrix")


def batch_specs(batch: dict, axis: str = MODEL_AXIS,
                data_axis: str | None = None) -> dict:
    """Partition specs for the batch: edge-grid fields row-sharded over `axis`;
    with `data_axis` set, every field's leading (batch) axis is additionally
    sharded over it (combined DP x SP)."""
    specs = {}
    for k, v in batch.items():
        if k in _ROW_SHARDED:
            specs[k] = P(data_axis, axis)
        else:
            specs[k] = P(data_axis)
    return specs


def output_spec(readout_kind: str, axis: str = MODEL_AXIS,
                data_axis: str | None = None):
    if readout_kind == "graph":
        return P(data_axis)             # psum-pooled over `axis`
    if readout_kind == "node":
        return P(data_axis, axis)       # (b, l, t) row-sharded
    if readout_kind == "edge":
        return P(data_axis, axis)       # (b, l, l, t) row-sharded
    raise ValueError(readout_kind)


def edge_partitioned_forward(model, params, batch, mesh, axis: str = MODEL_AXIS,
                             data_axis: str | None = None,
                             training: bool = False, rng=None):
    """Run the model forward with the edge grid sharded over `axis` (and the
    batch optionally sharded over `data_axis` — combined DP x SP).

    `batch` is a host/global batch dict; row-sharded fields are partitioned by
    shard_map, everything else is replicated (per data shard). Returns the full
    (logical) output.
    """
    bspecs = batch_specs(batch, axis, data_axis)
    ospec = output_spec(model.cfg.readout_kind, axis, data_axis)

    def fn(params, batch):
        out, _ = model.apply(params, batch, training=training, rng=rng,
                             sp_axis=axis)
        return out

    fn_sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), bspecs),
        out_specs=ospec,
        check_vma=False,
    )
    return fn_sharded(params, batch)
