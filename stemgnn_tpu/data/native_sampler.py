"""ctypes bindings for the native (C++) neighbor sampler.

Loads ``stemgnn_tpu/native/libstemgnn_sampler.so`` (built on demand via make)
and exposes :func:`sample_subgraph_native` with the same contract as the
numpy :func:`stemgnn_tpu.data.sampler.sample_subgraph`.  Falls back cleanly
when no compiler/so is available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libstemgnn_sampler.so")
_lib = None
_load_failed = False


def build_native(force: bool = False) -> bool:
    """Compile the sampler shared library; returns success."""
    if osp.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return osp.exists(_SO_PATH)
    except Exception:
        return False


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not osp.exists(_SO_PATH) and not build_native():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _load_failed = True
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.stemgnn_sample_subgraph.restype = ctypes.c_int
    lib.stemgnn_sample_subgraph.argtypes = [
        i64p, i32p, i64p, ctypes.c_int64,           # csc
        i64p, ctypes.c_int64,                        # seeds
        i64p, ctypes.c_int64,                        # fanouts
        ctypes.c_uint64,                             # rng seed
        i64p, i64p, ctypes.c_int64,                  # out nodes
        i32p, i32p, i64p, i64p, ctypes.c_int64,      # out edges
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def sample_subgraph_native(csc, seeds: np.ndarray, fanouts: Sequence[int],
                           rng_seed: int,
                           node_cap: Optional[int] = None,
                           edge_cap: Optional[int] = None,
                           with_clamped: bool = False):
    """Native fanout sampling; same return contract as
    data.sampler.sample_subgraph: (nodes, e_src, e_dst, e_id).
    ``with_clamped`` appends a bool: whether a capacity cap actually
    clamped the sample (an exact fill is NOT a clamp)."""
    lib = _get_lib()
    assert lib is not None, "native sampler unavailable (build failed?)"
    seeds = np.ascontiguousarray(seeds, np.int64)
    fan = np.ascontiguousarray(fanouts, np.int64)
    unbounded = any(int(f) < 0 for f in fanouts)
    if node_cap is None:
        if unbounded:
            node_cap = csc.num_nodes + len(seeds)
        else:
            cap = len(seeds)
            width = len(seeds)
            for f in fanouts:
                width *= max(int(f), 1)
                cap += width
            node_cap = min(cap, csc.num_nodes + len(seeds))
    if edge_cap is None:
        edge_cap = len(csc.src) if unbounded else \
            node_cap * max(max(int(f) for f in fanouts), 1)

    out_nodes = np.empty(node_cap, np.int64)
    out_nn = np.empty(1, np.int64)
    out_esrc = np.empty(edge_cap, np.int32)
    out_edst = np.empty(edge_cap, np.int32)
    out_eid = np.empty(edge_cap, np.int64)
    out_ne = np.empty(1, np.int64)

    indptr = np.ascontiguousarray(csc.indptr, np.int64)
    src = np.ascontiguousarray(csc.src, np.int32)
    eid = np.ascontiguousarray(csc.edge_id, np.int64)

    rc = lib.stemgnn_sample_subgraph(
        _ptr(indptr, ctypes.c_int64), _ptr(src, ctypes.c_int32),
        _ptr(eid, ctypes.c_int64), ctypes.c_int64(csc.num_nodes),
        _ptr(seeds, ctypes.c_int64), ctypes.c_int64(len(seeds)),
        _ptr(fan, ctypes.c_int64), ctypes.c_int64(len(fan)),
        ctypes.c_uint64(rng_seed & (2**64 - 1)),
        _ptr(out_nodes, ctypes.c_int64), _ptr(out_nn, ctypes.c_int64),
        ctypes.c_int64(node_cap),
        _ptr(out_esrc, ctypes.c_int32), _ptr(out_edst, ctypes.c_int32),
        _ptr(out_eid, ctypes.c_int64), _ptr(out_ne, ctypes.c_int64),
        ctypes.c_int64(edge_cap))
    nn, ne = int(out_nn[0]), int(out_ne[0])
    # rc != 0 <=> a capacity cap clamped the sample (the numpy sampler's
    # clamp semantics); an exact fill returns rc == 0
    out = (out_nodes[:nn].copy(), out_esrc[:ne].copy(),
           out_edst[:ne].copy(), out_eid[:ne].copy())
    return out + (rc != 0,) if with_clamped else out
