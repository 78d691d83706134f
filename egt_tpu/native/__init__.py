"""ctypes loader/builder for the native batch assembler.

Compiles `batch_builder.cpp` once into `_libbatch.so` next to this file (g++,
-O3 -fopenmp), then binds the C-ABI entry points. Falls back gracefully: callers
check `available()` and use the pure-numpy path when the toolchain or the .so is
missing (see data/dataset.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "batch_builder.cpp"
_LIB = _HERE / "_libbatch.so"

_lib = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_ll = ctypes.c_int64


def _build() -> bool:
    try:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
               str(_SRC), "-o", str(_LIB) + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(str(_LIB) + ".tmp", _LIB)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    lib.assemble_adjacency.argtypes = [
        _i64p, _ll, _i32p, _i64p, _i64p, _ll, _f32p]
    lib.assemble_feature_matrix_i32.argtypes = [
        _i64p, _ll, _i64p, _i64p, _i32p, _i64p, _ll, _i32p]
    lib.assemble_feature_matrix_f32.argtypes = [
        _i64p, _ll, _i64p, _i64p, _f32p, _i64p, _ll, _ll, _f32p]
    lib.assemble_feature_matrix_i32_multi.argtypes = [
        _i64p, _ll, _i64p, _i64p, _i32p, _i64p, _ll, _ll, _i32p]
    lib.assemble_edge_targets.argtypes = [
        _i64p, _ll, _i64p, _i64p, _i32p, _i64p, _ll, _i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None and os.environ.get("EGT_TPU_NO_NATIVE") != "1"


def assemble_adjacency(sel, num_nodes, edges_flat, edges_off, L, adj_out):
    _load().assemble_adjacency(
        np.ascontiguousarray(sel, np.int64), len(sel),
        np.ascontiguousarray(num_nodes, np.int32),
        np.ascontiguousarray(edges_flat, np.int64),
        np.ascontiguousarray(edges_off, np.int64), L, adj_out)


def assemble_feature_matrix_i32(sel, edges_flat, edges_off, feat_flat, feat_off,
                                L, fm_out):
    _load().assemble_feature_matrix_i32(
        np.ascontiguousarray(sel, np.int64), len(sel),
        np.ascontiguousarray(edges_flat, np.int64),
        np.ascontiguousarray(edges_off, np.int64),
        np.ascontiguousarray(feat_flat, np.int32),
        np.ascontiguousarray(feat_off, np.int64), L, fm_out)


def assemble_feature_matrix_f32(sel, edges_flat, edges_off, feat_flat, feat_off,
                                F, L, fm_out):
    _load().assemble_feature_matrix_f32(
        np.ascontiguousarray(sel, np.int64), len(sel),
        np.ascontiguousarray(edges_flat, np.int64),
        np.ascontiguousarray(edges_off, np.int64),
        np.ascontiguousarray(feat_flat, np.float32),
        np.ascontiguousarray(feat_off, np.int64), F, L, fm_out)


def assemble_feature_matrix_i32_multi(sel, edges_flat, edges_off, feat_flat,
                                      feat_off, F, L, fm_out):
    _load().assemble_feature_matrix_i32_multi(
        np.ascontiguousarray(sel, np.int64), len(sel),
        np.ascontiguousarray(edges_flat, np.int64),
        np.ascontiguousarray(edges_off, np.int64),
        np.ascontiguousarray(feat_flat, np.int32),
        np.ascontiguousarray(feat_off, np.int64), F, L, fm_out)


def assemble_edge_targets(sel, edges_flat, edges_off, labels_flat, labels_off,
                          L, tgt_out):
    _load().assemble_edge_targets(
        np.ascontiguousarray(sel, np.int64), len(sel),
        np.ascontiguousarray(edges_flat, np.int64),
        np.ascontiguousarray(edges_off, np.int64),
        np.ascontiguousarray(labels_flat, np.int32),
        np.ascontiguousarray(labels_off, np.int64), L, tgt_out)
