"""WideBVH build via the native C++ builder, with Python fallback.

Same output contract as ops/bvh8.build; the native path is ~2 orders of
magnitude faster on the host and is the default used by Scene build for
large triangle counts. Produces the packed (bf16-box, entry-coded) wide
format; ``build_legacy8`` in ops/bvh8.py keeps the round-1 format for the
experimental Pallas kernels.
"""

from __future__ import annotations

import ctypes
import hashlib
import os

import jax
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops import bvh8 as bvh8_py
from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import (
    ARITY,
    LEAF_SIZE,
    WideBVH,
    pack_wide,
)
from fovpathtracing_optixcodelatest_tpu.ops.native import load_library


def collapse_native(tris: np.ndarray, leaf_size: int, arity: int):
    """Run the native binned-SAH build + collapse. Returns
    (boxes, meta, order_slots) or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None

    tris = np.ascontiguousarray(tris, dtype=np.float32)
    t_count = tris.shape[0]
    boxes_p = ctypes.POINTER(ctypes.c_float)()
    meta_p = ctypes.POINTER(ctypes.c_int32)()
    perm_p = ctypes.POINTER(ctypes.c_int32)()
    num_nodes = ctypes.c_int64()
    num_slots = ctypes.c_int64()
    rc = lib.fovtix_build_bvhw(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(t_count),
        ctypes.c_int(leaf_size),
        ctypes.c_int(arity),
        ctypes.byref(boxes_p),
        ctypes.byref(meta_p),
        ctypes.byref(num_nodes),
        ctypes.byref(perm_p),
        ctypes.byref(num_slots),
    )
    if rc != 0:
        return None
    try:
        m = num_nodes.value
        s = num_slots.value
        boxes = np.ctypeslib.as_array(boxes_p, shape=(m, arity, 6)).copy()
        meta = np.ctypeslib.as_array(meta_p, shape=(m, arity, 2)).copy()
        perm = np.ctypeslib.as_array(perm_p, shape=(s,)).copy()
    finally:
        lib.fovtix_free(boxes_p)
        lib.fovtix_free(meta_p)
        lib.fovtix_free(perm_p)
    return boxes, meta, perm.astype(np.int64)


# Scene-size-dependent packing default. Measured (PLAN.md rules 21/31):
# VMEM-resident tables want NARROW rows (L6/A16 = 64 cols: frame 642->540 ms
# at the bench scene — the gather costs ~0.8 us/col), while HBM-resident
# tables are per-INDEX-rate, so FEWER POPS win (L12/A32 = 128 cols: 0.59 ->
# 0.69 Mrays/s at 1.9M tris). The threshold is the measured crossover scale.
DEEP_LEAF_SIZE = 12
DEEP_ARITY = 32
DEEP_TRIS_THRESHOLD = 1_000_000
# San-Miguel-class scenes go further along the fewer-pops curve: at 10M tris
# L24/A32 halves the row count (1.34M -> 612k) and measured 0.30 -> 0.35
# Mrays/s (r5_deeppack); L16/A64 (stack 246) and L32/A32 measured worse.
DEEPER_LEAF_SIZE = 24
DEEPER_TRIS_THRESHOLD = 4_000_000
# Treelet budget (rows) for deep tables: the traversal's gather window
# (traverse8.WINDOW_ROWS = 8192). Bigger treelets = fewer pending entries
# per ray (fewer serving rounds); a row-sorted chunk usually sits inside
# one treelet = one dynamic_slice window.
DEEP_TREELET_BUDGET = int(os.environ.get("FOVTPU_TREELET", 8192))

# Host-side build cache for big scenes: the 10M-tri native SAH build runs
# 57-130 s and the treelet/grouping layout adds Python DFS passes on top —
# all deterministic functions of (tris, packing params, layout version).
# Caching the FINAL packed table makes the warm start one npz read + one
# device upload (VERDICT r4 item 5: 10M warm start <= 150 s). "" disables.
BVH_CACHE_DIR = os.environ.get("FOVTPU_BVH_CACHE", "/tmp/fovtpu_bvh_cache")
# bump when any build/layout code changes the packed output
_BVH_CACHE_VERSION = 1
# caching tiny builds costs more in hashing than it saves
BVH_CACHE_MIN_TRIS = 200_000


def _cache_key(tris, leaf_size, arity, dfs, budget) -> str:
    h = hashlib.sha1()
    grp = os.environ.get("FOVTPU_TGROUP", "1")
    gdiv = os.environ.get("FOVTPU_TGROUP_DIV", "4")
    h.update(
        f"v{_BVH_CACHE_VERSION}|{tris.shape[0]}|{leaf_size}|{arity}|"
        f"{int(dfs)}|{budget}|g{grp}|d{gdiv}|".encode()
    )
    h.update(np.ascontiguousarray(tris, dtype=np.float32).tobytes())
    return h.hexdigest()


def _cache_load(key: str) -> WideBVH | None:
    path = os.path.join(BVH_CACHE_DIR, key + ".npz")
    try:
        z = np.load(path)
    except OSError:
        return None
    top_rows = int(z["top_rows"])
    table = z["table"]
    top_np = table[:top_rows].copy() if top_rows else None
    dev = jax.device_put((table, z["leaf_perm"], top_np))
    return WideBVH(
        table=dev[0], leaf_perm=dev[1], top_table=dev[2],
        leaf_size=int(z["leaf_size"]), arity=int(z["arity"]), packed=True,
        stack_depth=int(z["stack_depth"]), dfs=bool(z["dfs"]),
        top_rows=top_rows, top_stack=int(z["top_stack"]),
        treelet_stack=int(z["treelet_stack"]),
    )


def _cache_save(key: str, bvh: WideBVH) -> None:
    try:
        os.makedirs(BVH_CACHE_DIR, exist_ok=True)
        path = os.path.join(BVH_CACHE_DIR, key + ".npz")
        tmp = path + f".tmp{os.getpid()}.npz"
        np.savez(
            tmp,
            table=np.asarray(bvh.table),
            leaf_perm=np.asarray(bvh.leaf_perm),
            top_rows=bvh.top_rows,
            leaf_size=bvh.leaf_size,
            arity=bvh.arity,
            stack_depth=bvh.stack_depth,
            dfs=bvh.dfs,
            top_stack=bvh.top_stack,
            treelet_stack=bvh.treelet_stack,
        )
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort


def build(tris: np.ndarray, leaf_size: int | None = None,
          arity: int | None = None,
          force_python: bool = False,
          dfs: bool | None = None) -> WideBVH:
    """Build a packed WideBVH from (T, 3, 3) float32 corners
    (native collapse if available). ``leaf_size``/``arity`` default by
    scene size (see DEEP_TRIS_THRESHOLD). ``dfs`` (default: on for deep
    scenes) applies the DFS-interleaved row order the windowed HBM
    traversal wants (bvh8.dfs_permute_host)."""
    deep = tris.shape[0] >= DEEP_TRIS_THRESHOLD
    deeper = tris.shape[0] >= DEEPER_TRIS_THRESHOLD
    if leaf_size is None:
        leaf_size = (
            DEEPER_LEAF_SIZE if deeper else
            DEEP_LEAF_SIZE if deep else LEAF_SIZE
        )
    if arity is None:
        arity = DEEP_ARITY if deep else ARITY
    if dfs is None:
        dfs = deep
    budget = DEEP_TREELET_BUDGET if (deep and dfs) else 0
    cacheable = (
        BVH_CACHE_DIR
        and not force_python
        and tris.shape[0] >= BVH_CACHE_MIN_TRIS
    )
    key = None
    if cacheable:
        key = _cache_key(tris, leaf_size, arity, dfs, budget)
        cached = _cache_load(key)
        if cached is not None:
            return cached
    out = None if force_python else collapse_native(tris, leaf_size, arity)
    if out is None:
        boxes, meta, perm = bvh8_py.collapse_bvh2(tris, leaf_size, arity)
    else:
        boxes, meta, perm = out
    bvh = pack_wide(boxes, meta, tris, perm, leaf_size, arity, dfs=dfs,
                    treelet_budget=budget)
    if cacheable:
        _cache_save(key, bvh)
    return bvh
