"""The matrix-derived `use_pallas: "auto"` dispatch rule (VERDICT r2 #7).

The committed CROSSOVER_MATRIX.json is the source of truth: the derived
threshold rule must reproduce its xla-vs-attn argmin at every measured point,
and the model's `_auto_fused` must follow the same rule.
"""

import json
import math
import os

from egt_tpu.ops.crossover import (derive_thresholds, fused_attention_wins,
                                   matrix_path, measured_points)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows():
    return json.load(open(os.path.join(REPO, "CROSSOVER_MATRIX.json")))


def test_matrix_file_resolves():
    assert os.path.exists(matrix_path())


def test_rule_agrees_with_matrix_argmins():
    rows = _rows()
    for dtype in sorted({r.get("dtype", "bfloat16") for r in rows}):
        points = measured_points(rows, dtype)
        assert points, f"no measured xla/attn pairs for {dtype}"
        for (l, ew), attn_wins in points.items():
            got = fused_attention_wins(l, ew, dtype)
            assert got == attn_wins, (
                f"auto rule disagrees with matrix at l={l} ew={ew} "
                f"[{dtype}]: rule={got} matrix={attn_wins}")


def test_thresholds_monotone_semantics():
    """A threshold means: wins at/above, loses below — check internal
    consistency of the derivation on the committed matrix."""
    rows = _rows()
    th = derive_thresholds(rows, "bfloat16")
    assert th, "no thresholds derived from committed matrix"
    for ew, t in th.items():
        assert t > 0
        pts = {l: w for (l, e), w in measured_points(rows, "bfloat16").items()
               if e == ew}
        for l, wins in pts.items():
            if wins:
                assert math.isfinite(t) and l >= t, (
                    f"measured win at l={l} sits below the derived "
                    f"threshold {t} (ew={ew})")
            else:
                assert l < t, (
                    f"measured loss at l={l} sits at/above the derived "
                    f"threshold {t} (ew={ew})")


def test_model_auto_follows_rule():
    from egt_tpu.models.graph_model import GraphModelConfig
    from egt_tpu.models.layers import _auto_fused

    cfg = GraphModelConfig(
        model_width=64, edge_width=64, num_heads=8, model_height=2,
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=4, num_edge_features=4, num_targets=1,
        readout_kind="graph", compute_dtype="bfloat16")
    cfg.fused_attention = "auto"
    for l in (40, 160, 192, 512):
        assert _auto_fused(cfg, l) == fused_attention_wins(l, 64, "bfloat16")
    # explicit override beats the matrix
    cfg.fused_attention = True
    assert _auto_fused(cfg, 8)
    cfg.fused_attention = False
    assert not _auto_fused(cfg, 4096)


def test_fallback_without_matrix(tmp_path):
    """No matrix file -> round-2 constant 176."""
    missing = str(tmp_path / "nope.json")
    assert not fused_attention_wins(160, 64, "bfloat16", path=missing)
    assert fused_attention_wins(176, 64, "bfloat16", path=missing)


def test_one_sided_ew_borrows_bracket():
    """An edge width with only kernel-wins points takes the all-ew xla bound."""
    rows = [
        {"shape": "a", "path": "xla", "dtype": "bfloat16", "l": 160, "ew": 64,
         "ms_per_step": 10.0},
        {"shape": "a", "path": "attn", "dtype": "bfloat16", "l": 160, "ew": 64,
         "ms_per_step": 11.0},
        {"shape": "b", "path": "xla", "dtype": "bfloat16", "l": 192, "ew": 8,
         "ms_per_step": 12.0},
        {"shape": "b", "path": "attn", "dtype": "bfloat16", "l": 192, "ew": 8,
         "ms_per_step": 9.0},
    ]
    th = derive_thresholds(rows, "bfloat16")
    assert 160 < th[8] <= 192                 # bracketed by the all-ew bound
    # loss-only ew=64 borrows the nearest win-measured threshold, never an
    # extrapolated win below its own measured loss
    assert th[64] > 160
    # rule consistency at every toy point
    from egt_tpu.ops import crossover as co
    pts = co.measured_points(rows, "bfloat16")
    for (l, ew), wins in pts.items():
        nearest = min(th, key=lambda e: abs(e - ew))
        assert (l >= th[nearest]) == wins


def test_vpu_rule_from_matrix():
    """attention_impl='auto' consults measured vpu-vs-xla rows; unmeasured
    shapes take the nearest (d, l) point; no rows -> einsum stands."""
    from egt_tpu.ops import crossover as co
    rows = [
        {"shape": "a", "path": "xla", "dtype": "bfloat16", "l": 40, "ew": 64,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 10.0},
        {"shape": "a", "path": "vpu", "dtype": "bfloat16", "l": 40, "ew": 64,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 9.0},
        {"shape": "b", "path": "xla", "dtype": "bfloat16", "l": 192, "ew": 8,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 10.0},
        {"shape": "b", "path": "vpu", "dtype": "bfloat16", "l": 192, "ew": 8,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 12.0},
    ]
    pts = co.vpu_points(rows, "bfloat16")
    assert pts == {(40, 8, 8): True, (192, 8, 8): False}
    # a vpu+c16 row takes precedence over the plain vpu row for the same shape
    rows_c16 = rows + [
        {"shape": "a", "path": "vpu+c16", "dtype": "bfloat16", "l": 40,
         "ew": 64, "w": 64, "h": 8, "b": 128, "ms_per_step": 11.0}]
    assert co.vpu_points(rows_c16, "bfloat16")[(40, 8, 8)] is False
    import json, tempfile, os
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as fp:
        json.dump(rows, fp)
    try:
        assert co.vpu_attention_wins(40, 8, 8, "bfloat16", path) is True
        assert co.vpu_attention_wins(48, 8, 8, "bfloat16", path) is True
        assert co.vpu_attention_wins(192, 8, 8, "bfloat16", path) is False
        assert co.vpu_attention_wins(512, 8, 8, "bfloat16", path) is False
        # no matrix at all -> einsum
        assert co.vpu_attention_wins(40, 8, 8, "bfloat16", "/nonexistent") \
            is False
    finally:
        os.unlink(path)


def test_vpu_extrapolation_guard():
    """Far outside the measured (d, l) band the rule must fall back to the
    einsum path instead of silently extrapolating a vpu win (VERDICT r3
    weak #7): no measured head dim within +/-2, or length beyond 2x the
    nearest head dim's measured range."""
    import json, os, tempfile

    from egt_tpu.ops import crossover as co
    rows = [
        {"shape": "a", "path": "xla", "dtype": "bfloat16", "l": 40, "ew": 64,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 10.0},
        {"shape": "a", "path": "vpu", "dtype": "bfloat16", "l": 40, "ew": 64,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 9.0},
        {"shape": "b", "path": "xla", "dtype": "bfloat16", "l": 192, "ew": 8,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 10.0},
        {"shape": "b", "path": "vpu", "dtype": "bfloat16", "l": 192, "ew": 8,
         "w": 64, "h": 8, "b": 128, "ms_per_step": 9.0},
    ]
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as fp:
        json.dump(rows, fp)
    try:
        # inside the band: the nearest measured point's verdict stands
        assert co.vpu_attention_wins(64, 8, 8, "bfloat16", path) is True
        # head dim far from anything measured (d=8 only): einsum fallback
        assert co.vpu_attention_wins(64, 16, 8, "bfloat16", path) is False
        # d matches but l is >2x beyond the measured range [40, 192]
        assert co.vpu_attention_wins(4096, 8, 8, "bfloat16", path) is False
        # ... and below half the measured minimum
        assert co.vpu_attention_wins(16, 8, 8, "bfloat16", path) is False
    finally:
        os.unlink(path)


def _row(shape, path, l, ew, w, h, ms):
    return {"shape": shape, "path": path, "dtype": "bfloat16", "l": l,
            "ew": ew, "w": w, "h": h, "b": 128, "ms_per_step": ms}


def test_best_paths_argmin():
    """The joint auto rule is the per-shape argmin over {xla, attn, vpu} —
    including the measured round-3 case where vpu+c16 beats the Pallas kernel
    at l=192 (a kernel-first cascade would dispatch a loser)."""
    from egt_tpu.ops import crossover as co
    rows = [
        _row("z", "xla", 40, 64, 64, 8, 15.2),
        _row("z", "attn", 40, 64, 64, 8, 30.0),
        _row("z", "vpu+c16", 40, 64, 64, 8, 13.7),
        _row("p", "xla", 192, 8, 64, 8, 297.0),
        _row("p", "attn", 192, 8, 64, 8, 252.0),
        _row("p", "vpu+c16", 192, 8, 64, 8, 226.0),
        _row("m", "xla", 80, 64, 96, 8, 10.0),
        _row("m", "attn", 80, 64, 96, 8, 12.0),
        _row("m", "vpu", 80, 64, 96, 8, 14.0),
        _row("t", "xla", 512, 64, 64, 8, 100.0),
        _row("t", "attn", 512, 64, 64, 8, 90.0),
    ]
    bp = co.best_paths(rows, "bfloat16")
    assert bp == {(40, 64, 8, 8): "vpu", (192, 8, 8, 8): "vpu",
                  (80, 64, 12, 8): "xla", (512, 64, 8, 8): "attn"}
    import json, os, tempfile
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as fp:
        json.dump(rows, fp)
    try:
        # exact points dispatch their argmin
        assert co.auto_dispatch(40, 64, 8, 8, "bfloat16", path) == "vpu"
        assert co.auto_dispatch(192, 8, 8, 8, "bfloat16", path) == "vpu"
        assert co.auto_dispatch(80, 64, 12, 8, "bfloat16", path) == "xla"
        assert co.auto_dispatch(512, 64, 8, 8, "bfloat16", path) == "attn"
        # unmeasured shapes: attn by the vs-best per-ew bracket (the only
        # measured win is l=512 ew=64, losses below at 80 -> threshold
        # sqrt(80*512)~202), else the nearest-(d,l) vpu rule
        assert co.auto_dispatch(48, 48, 6, 8, "bfloat16", path) == "vpu"
        assert co.auto_dispatch(256, 8, 8, 8, "bfloat16", path) == "attn"
        assert co.auto_dispatch(400, 64, 8, 8, "bfloat16", path) == "attn"
        # no matrix: legacy threshold, attn iff l >= 176
        assert co.auto_dispatch(40, 64, 8, 8, "bfloat16", "/nonexistent") \
            == "xla"
        assert co.auto_dispatch(192, 8, 8, 8, "bfloat16", "/nonexistent") \
            == "attn"
    finally:
        os.unlink(path)


def test_shipped_matrix_dispatch_agrees_with_argmin():
    """Every measured point of the COMMITTED matrix dispatches its own
    argmin path (VERDICT r2 item 7, extended to the three-way rule)."""
    import json

    from egt_tpu.ops import crossover as co
    rows = json.load(open(co.matrix_path()))
    for dtype in sorted({r.get("dtype", "bfloat16") for r in rows}):
        for (l, ew, d, h), path in co.best_paths(rows, dtype).items():
            assert co.auto_dispatch(l, ew, d, h, dtype) == path


def test_fused_layer_rule_from_matrix():
    """fused_layer='auto' consults measured layer-vs-best rows with the same
    nearest-point + band extrapolation guard as the vpu rule (r5: the split
    backward makes the whole-layer kernel the measured argmin at l=192
    ew=8)."""
    import json, os, tempfile

    from egt_tpu.ops import crossover as co
    rows = [
        _row("p", "xla", 192, 8, 64, 8, 400.0),
        _row("p", "vpu+c16", 192, 8, 64, 8, 226.0),
        _row("p", "layer", 192, 8, 64, 8, 218.0),
        _row("z", "xla", 40, 64, 64, 8, 15.0),
        _row("z", "vpu+c16", 40, 64, 64, 8, 13.7),
        _row("z", "layer", 40, 64, 64, 8, 30.0),
    ]
    pts = co.fused_layer_points(rows, "bfloat16")
    assert pts == {(192, 8): True, (40, 64): False}
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as fp:
        json.dump(rows, fp)
    try:
        # measured points dispatch their verdict
        assert co.fused_layer_wins(192, 8, "bfloat16", path) is True
        assert co.fused_layer_wins(40, 64, "bfloat16", path) is False
        # inside the band of the nearest ew: nearest point's verdict
        assert co.fused_layer_wins(128, 8, "bfloat16", path) is True
        # guards: unmeasured edge width / length outside 2x band -> False
        assert co.fused_layer_wins(192, 16, "bfloat16", path) is False
        assert co.fused_layer_wins(512, 8, "bfloat16", path) is False
        assert co.fused_layer_wins(64, 8, "bfloat16", path) is False
        # no matrix -> never the kernel
        assert co.fused_layer_wins(192, 8, "bfloat16", "/nonexistent") is False
    finally:
        os.unlink(path)


def test_shipped_matrix_fused_layer_agrees():
    """Every (l, ew) with a measured layer cell in the COMMITTED matrix:
    the auto rule returns exactly the measured layer-vs-best verdict."""
    import json

    from egt_tpu.ops import crossover as co
    rows = json.load(open(co.matrix_path()))
    for dtype in sorted({r.get("dtype", "bfloat16") for r in rows}):
        for (l, ew), wins in co.fused_layer_points(rows, dtype).items():
            assert co.fused_layer_wins(l, ew, dtype) == wins, (l, ew, dtype)


def test_can_fuse_layer_auto_resolution():
    """cfg.fused_layer='auto' resolves through the measured rule per traced
    length; True still pins; False still disables."""
    import json, os, tempfile

    from egt_tpu.models.graph_model import GraphModelConfig
    from egt_tpu.ops import crossover as co
    from egt_tpu.ops import fused_layer_pallas as flp

    cfg = GraphModelConfig(
        model_width=64, edge_width=8, num_heads=8, model_height=2,
        node_input_kind="tokens", edge_input_kind="tokens",
        num_node_features=4, num_edge_features=4, num_targets=1,
        readout_kind="graph", compute_dtype="bfloat16")
    cfg.fused_layer = "auto"
    rows = [
        _row("p", "xla", 192, 8, 64, 8, 400.0),
        _row("p", "vpu+c16", 192, 8, 64, 8, 226.0),
        _row("p", "layer", 192, 8, 64, 8, 218.0),
    ]
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as fp:
        json.dump(rows, fp)
    old = co.matrix_path
    co._fused_layer_points_cached.cache_clear()
    co.matrix_path = lambda: path
    try:
        assert flp.can_fuse_layer(cfg, True, None, False, 192)
        assert not flp.can_fuse_layer(cfg, True, None, False, 512)
        cfg.fused_layer = False
        assert not flp.can_fuse_layer(cfg, True, None, False, 192)
        cfg.fused_layer = True
        assert flp.can_fuse_layer(cfg, True, None, False, 512)
    finally:
        co.matrix_path = old
        co._fused_layer_points_cached.cache_clear()
        os.unlink(path)
