"""Kernel-selection thresholds derived from the measured crossover matrix.

`use_pallas: "auto"` must decide, per traced pad length, whether the fused
attention kernel (ops/egt_pallas.py) beats the plain XLA einsum path. Round 2
hard-coded the decision as `l >= 176`; this module replaces the constant with a
rule DERIVED from CROSSOVER_MATRIX.json (produced by `tools/layerbench.py
--matrix` on the real chip), so re-running the sweep retunes the dispatch with
no code edit.

Rule shape: the kernel's win region is monotone in l at fixed edge width (the
kernel amortizes its fixed per-program cost over l^2 work while the XLA path
keeps relayouting (b,l,l,*) tensors), so for each measured edge width we place
the threshold at the geometric midpoint between the largest l where XLA wins
and the smallest l where the kernel wins. Edge widths with only one side
measured borrow the missing side from the all-ew pool; with no matrix at all,
the round-2 constant 176 is the fallback.

`tests/test_crossover.py` asserts the derived rule agrees with the matrix's
argmin at every measured (l, ew) point — the matrix is the source of truth.
"""

from __future__ import annotations

import functools
import json
import math
import os

_DEFAULT_THRESHOLD = 176  # round-2 measured constant (CROSSOVER_MATRIX.json)

# (l, ew) for legacy matrix rows that predate per-row shape fields
_LEGACY_SHAPES = {
    "zinc500k": (40, 64), "zinc100k": (40, 48), "pattern500k": (192, 8),
    "cluster500k": (192, 8), "mnist500k": (80, 64), "cifar500k": (160, 64),
    "tsp500k": (512, 64),
}


def matrix_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "CROSSOVER_MATRIX.json")


def _load_rows(path: str | None):
    path = path or matrix_path()
    try:
        with open(path) as fp:
            return json.load(fp)
    except (OSError, ValueError):
        return []


def measured_points(rows, dtype: str = "bfloat16", vs_best: bool = False):
    """-> {(l, ew): attn_wins} for every (shape, dtype) with both the xla and
    attn train-step cells measured. With `vs_best` the kernel must beat the
    best NON-Pallas path (min of the xla and vpu/vpu+c16 cells) — the joint
    auto dispatch compares against what would actually run instead."""
    by_shape = {}
    for r in rows:
        if r.get("dtype", "bfloat16") != dtype or "ms_per_step" not in r:
            continue
        key = r["shape"]
        by_shape.setdefault(key, {})[r["path"]] = r
    points = {}
    for name, cells in by_shape.items():
        if "xla" not in cells or "attn" not in cells:
            continue
        row = cells["attn"]
        if "l" in row and "ew" in row:
            l, ew = int(row["l"]), int(row["ew"])
        elif name in _LEGACY_SHAPES:
            l, ew = _LEGACY_SHAPES[name]
        else:
            continue
        ref = cells["xla"]["ms_per_step"]
        if vs_best:
            vpu_cell = cells.get("vpu+c16") or cells.get("vpu")
            if vpu_cell is not None:
                ref = min(ref, vpu_cell["ms_per_step"])
        points[(l, ew)] = cells["attn"]["ms_per_step"] < ref
    return points


def derive_thresholds(rows, dtype: str = "bfloat16", vs_best: bool = False):
    """-> {ew: l_threshold} (attn wins iff l >= threshold), one entry per
    measured edge width, geometric-midpoint placement with all-ew fallback for
    one-sided edge widths."""
    points = measured_points(rows, dtype, vs_best)
    if not points:
        return {}
    all_xla = [l for (l, _), wins in points.items() if not wins]
    out = {}
    # pass 1: every ew with a measured kernel win gets a bracketed threshold
    for ew in sorted({ew for (_, ew) in points}):
        xla_ls = [l for (l, e), wins in points.items()
                  if e == ew and not wins]
        attn_ls = [l for (l, e), wins in points.items() if e == ew and wins]
        if not attn_ls:
            continue
        hi = min(attn_ls)
        # bracket with the largest BELOW-hi xla point, locally if measured,
        # else from the pooled set (losses above hi would invert the bracket)
        lo_pool = [l for l in (xla_ls or all_xla) if l < hi]
        out[ew] = math.sqrt(max(lo_pool) * hi) if lo_pool else hi
    # pass 2: loss-only edge widths take the nearest win-measured width's
    # threshold (no extrapolated win from unrelated shapes), floored above
    # their own largest measured loss; with no wins anywhere: inf
    win_derived = dict(out)
    for ew in sorted({ew for (_, ew) in points}):
        if ew in out:
            continue
        xla_ls = [l for (l, e), wins in points.items()
                  if e == ew and not wins]
        if not win_derived:
            out[ew] = math.inf
            continue
        nearest = min(win_derived, key=lambda e: abs(e - ew))
        out[ew] = max(win_derived[nearest],
                      max(xla_ls) + 1 if xla_ls else 0)
    return out


@functools.lru_cache(maxsize=4)
def _thresholds_cached(dtype: str, path: str | None):
    return derive_thresholds(_load_rows(path), dtype)


def fused_attention_wins(l: int, ew: int, dtype: str = "bfloat16",
                         path: str | None = None) -> bool:
    """The `use_pallas: "auto"` dispatch decision for a traced pad length `l`
    and edge width `ew`."""
    thresholds = _thresholds_cached(dtype, path)
    if not thresholds:
        return l >= _DEFAULT_THRESHOLD
    ew_key = min(thresholds, key=lambda e: abs(e - ew))  # nearest measured ew
    return l >= thresholds[ew_key]


def vpu_points(rows, dtype: str = "bfloat16"):
    """-> {(l, d, h): vpu_wins} for every shape with both the xla (einsum) and
    vpu train-step cells measured. `d` is the per-head dim w/h. The shipped
    vpu mode pairs the elementwise chains with the bf16 per-pair chain
    (measured + convergence-gated as a pair, DESIGN_NOTES "Round-3 vpu+c16"),
    so 'vpu+c16' rows take precedence over plain 'vpu' rows."""
    by_shape = {}
    for r in rows:
        if r.get("dtype", "bfloat16") != dtype or "ms_per_step" not in r:
            continue
        by_shape.setdefault(r["shape"], {})[r["path"]] = r
    points = {}
    for cells in by_shape.values():
        vpu_cell = cells.get("vpu+c16") or cells.get("vpu")
        if "xla" not in cells or vpu_cell is None:
            continue
        if not {"l", "w", "h"} <= vpu_cell.keys():
            continue
        key = (int(vpu_cell["l"]), int(vpu_cell["w"]) // int(vpu_cell["h"]),
               int(vpu_cell["h"]))
        points[key] = vpu_cell["ms_per_step"] < cells["xla"]["ms_per_step"]
    return points


@functools.lru_cache(maxsize=4)
def _vpu_points_cached(dtype: str, path: str | None):
    return vpu_points(_load_rows(path), dtype)


def vpu_attention_wins(l: int, d: int, h: int, dtype: str = "bfloat16",
                       path: str | None = None) -> bool:
    """The `attention_impl: "auto"` decision — should the non-Pallas attention
    run the VPU elementwise chains instead of the MXU einsums at this traced
    shape? Decided by the nearest measured (d, l) point of the crossover
    matrix; with nothing measured the einsum path stands. Far OUTSIDE the
    measured band the nearest-point rule would be a silent guess, so queries
    with no measured head dim within +/-2 or a length beyond 2x the nearest
    head dim's measured l range fall back to the einsum path (never a bad
    dispatch where vpu is unmeasured)."""
    points = _vpu_points_cached(dtype, path)
    if not points:
        return False
    key = min(points, key=lambda p: (abs(p[1] - d), abs(p[0] - l)))
    if abs(key[1] - d) > 2:
        return False
    band = [p[0] for p in points if p[1] == key[1]]
    if not (min(band) / 2 <= l <= max(band) * 2):
        return False
    return points[key]


def fused_layer_points(rows, dtype: str = "bfloat16"):
    """-> {(l, ew): layer_wins} for every shape where the whole-layer kernel
    AND at least one alternative train-step cell are measured: the layer wins
    iff its cell beats the min over every other measured path (xla / attn /
    vpu / vpu+c16 / edge) — the kernel replaces whichever of them would
    otherwise run."""
    by_shape = {}
    for r in rows:
        if r.get("dtype", "bfloat16") != dtype or "ms_per_step" not in r:
            continue
        by_shape.setdefault(r["shape"], {})[r["path"]] = r
    points = {}
    for cells in by_shape.values():
        layer = cells.get("layer")
        others = [c["ms_per_step"] for p, c in cells.items() if p != "layer"]
        if layer is None or not others:
            continue
        if not {"l", "ew"} <= layer.keys():
            continue
        points[(int(layer["l"]), int(layer["ew"]))] = \
            layer["ms_per_step"] < min(others)
    return points


@functools.lru_cache(maxsize=4)
def _fused_layer_points_cached(dtype: str, path: str | None):
    return fused_layer_points(_load_rows(path), dtype)


def fused_layer_wins(l: int, ew: int, dtype: str = "bfloat16",
                     path: str | None = None) -> bool:
    """Should the whole-layer megakernel run at this traced shape (when the
    config is inside its eligibility envelope)? Nearest measured (ew, l)
    point of the matrix, with the same extrapolation guard as the vpu rule:
    no measured edge width within +/-2, or a length beyond 2x / below half
    the nearest edge width's measured band, falls back to False (the
    attention-path cascade then dispatches normally — never an unmeasured
    kernel pick)."""
    points = _fused_layer_points_cached(dtype, path)
    if not points:
        return False
    key = min(points, key=lambda p: (abs(p[1] - ew), abs(p[0] - l)))
    if abs(key[1] - ew) > 2:
        return False
    band = [p[0] for p in points if p[1] == key[1]]
    if not (min(band) / 2 <= l <= max(band) * 2):
        return False
    nearest = min((p for p in points if p[1] == key[1]),
                  key=lambda p: abs(p[0] - l))
    return points[nearest]


def best_paths(rows, dtype: str = "bfloat16"):
    """-> {(l, ew, d, h): 'xla'|'attn'|'vpu'} — the measured train-step argmin
    among the three auto-dispatchable attention paths at every swept shape
    ('vpu+c16' rows stand in for 'vpu': the shipped vpu mode is the pair).
    Rationale: the r2 design ran two INDEPENDENT rules (Pallas-vs-xla
    threshold, then vpu-vs-xla) with Pallas taking precedence; the round-3
    sweep measured vpu+c16 BEATING the Pallas kernel at pattern l=192, so the
    joint decision must be a single argmin, not a rule cascade."""
    by_shape = {}
    for r in rows:
        if r.get("dtype", "bfloat16") != dtype or "ms_per_step" not in r:
            continue
        by_shape.setdefault(r["shape"], {})[r["path"]] = r
    out = {}
    for cells in by_shape.values():
        ref = cells.get("xla")
        if ref is None or not {"l", "ew", "w", "h"} <= ref.keys():
            continue
        cand = {"xla": ref}
        if "attn" in cells:
            cand["attn"] = cells["attn"]
        vpu_cell = cells.get("vpu+c16") or cells.get("vpu")
        if vpu_cell is not None:
            cand["vpu"] = vpu_cell
        key = (int(ref["l"]), int(ref["ew"]),
               int(ref["w"]) // int(ref["h"]), int(ref["h"]))
        out[key] = min(cand, key=lambda p: cand[p]["ms_per_step"])
    return out


@functools.lru_cache(maxsize=4)
def _thresholds_vs_best_cached(dtype: str, path: str | None):
    return derive_thresholds(_load_rows(path), dtype, vs_best=True)


def auto_dispatch(l: int, ew: int, d: int, h: int, dtype: str = "bfloat16",
                  path: str | None = None) -> str:
    """Joint auto rule when BOTH `use_pallas` and `attention_impl` are "auto".
    Cascade over the measured matrix, but with the Pallas kernel judged
    against the best NON-Pallas path (vs_best thresholds): at every measured
    point this equals the three-way argmin
    (tests/test_crossover.py::test_shipped_matrix_dispatch_agrees_with_argmin),
    while extrapolation stays conditioned the way each contest actually
    scales — per edge width for the kernel (its win amortizes the edge-stream
    share), per (head dim, l) for the vpu chains. No matrix: the legacy l>=176
    attn threshold."""
    thresholds = _thresholds_vs_best_cached(dtype, path)
    if thresholds:
        ew_key = min(thresholds, key=lambda e: abs(e - ew))
        if l >= thresholds[ew_key]:
            return "attn"
    elif l >= _DEFAULT_THRESHOLD:
        return "attn"
    if vpu_attention_wins(l, d, h, dtype, path):
        return "vpu"
    return "xla"
