"""EXPERIMENTAL: Pallas packet-traversal kernel (round-2 north-star path).

Design (see PLAN.md for the measurements that shaped it):
- Mosaic has no per-lane VMEM gather, so rays are processed in PACKETS that
  share one scalar node pointer; the unified BVH row is loaded by scalar
  dynamic indexing from the VMEM-resident table — ZERO gathers.
- The DFS stack is scalar state (SMEM-like scratch) per packet; all per-ray
  work (8-child slab tests, leaf Möller-Trumbore) is dense (8, LANES) VPU
  math.
- A packet descends into any child that ANY of its rays hits (union
  traversal): per-ray results stay exact; coherence only affects speed.

Status: CORRECT and COMPILED on real TPU (exact parity with
ops/traverse8.occluded). Mosaic landmines found and worked around:
- dynamic_slice of loop-CARRIED values is unlowered → stack lives in SMEM
  scratch with ref indexing;
- vector reductions / ref reads in the while COND crash the compiler →
  scalar pending-count carried through the body;
- a bool (8,128) array in the while CARRY crashes the compiler → carry
  occupancy as int32, cast on the final store.
MEASURED (v5e, box_city 7k tris, 256k coherent shadow rays): 0.34 Mrays/s vs
7.2 Mrays/s for the XLA per-ray path — packet union-traversal pays ~1-3 us
scalar-loop overhead per node visit and packets serialize on the single
TensorCore.

ROUND-2 VERDICT (see PLAN.md rules 11-13): the XLA per-ray loop was found to
be lockstep-TAIL-bound, not per-op bound — fixed by the two-phase capped
traversal in traverse8.closest_hit_staged (+51%), with per-iteration cost
row-rate-bound on the gather (~1.5 ns/row) and insensitive to arity/leaf/
stack-depth knobs. A Pallas kernel would need a per-lane VMEM gather to beat
it (still missing in Mosaic); the MXU one-hot gather alternative costs
~ the same as XLA's native gather (f32 table needs a 3x bf16 split). This
module stays as the measured negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import WIDTH, WideBVH

SUBLANES = 8
LANES = 128
PACKET = SUBLANES * LANES  # 1024 rays per packet


def _occlusion_kernel(table_ref, o_ref, d_ref, inv_ref, act_ref, occ_ref,
                      stack_ref,
                      *, num_rows, stack_depth, leaf_size, tmin, tmax):
    """One packet: shared scalar DFS over the unified table; dense per-ray
    slab + triangle tests on (8, LANES) tiles. The DFS stack lives in SMEM
    scratch (Mosaic cannot dynamic-slice loop-carried values). Leaf and node
    work both run every iteration, masked — one packet is lockstep anyway."""

    stack_ref[0] = 0  # root entry

    def body(state):
        sp, occ, _npend = state
        sp = sp - 1
        entry = stack_ref[sp]
        is_leaf = entry < 0
        row_idx = jnp.where(is_leaf, -entry - 1, entry)
        row = table_ref[row_idx, :]  # scalar-indexed row load

        pending = act_ref[0] & (occ == 0)

        # ---- leaf tests (masked by is_leaf) ----
        for k in range(leaf_size):
            b = k * 9
            v0 = (row[b], row[b + 1], row[b + 2])
            e1 = (row[b + 3], row[b + 4], row[b + 5])
            e2 = (row[b + 6], row[b + 7], row[b + 8])
            dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
            px = dy * e2[2] - dz * e2[1]
            py = dz * e2[0] - dx * e2[2]
            pz = dx * e2[1] - dy * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            det_ok = det > 1e-9  # occlusion rays cull back faces
            inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
            tx = o_ref[0, 0] - v0[0]
            ty = o_ref[0, 1] - v0[1]
            tz = o_ref[0, 2] - v0[2]
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1[2] - tz * e1[1]
            qy = tz * e1[0] - tx * e1[2]
            qz = tx * e1[1] - ty * e1[0]
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
            hit = (det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t >= tmin) & (t <= tmax) & pending & is_leaf)
            occ = jnp.maximum(occ, hit.astype(jnp.int32))

        # ---- node expansion (masked by is_node) ----
        is_node = ~is_leaf
        sp2 = sp
        for c in range(WIDTH):
            lo = (row[c * 6], row[c * 6 + 1], row[c * 6 + 2])
            hi = (row[c * 6 + 3], row[c * 6 + 4], row[c * 6 + 5])
            tn = jnp.full((SUBLANES, LANES), -jnp.inf)
            tf = jnp.full((SUBLANES, LANES), jnp.inf)
            for a in range(3):
                t0 = (lo[a] - o_ref[0, a]) * inv_ref[0, a]
                t1 = (hi[a] - o_ref[0, a]) * inv_ref[0, a]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            meta = jax.lax.bitcast_convert_type(
                row[48 + c * 2 : 48 + c * 2 + 2], jnp.int32
            )
            a_val, kind = meta[0], meta[1]
            any_hit = (
                jnp.any((tn <= tf) & (tf >= tmin) & (tn <= tmax) & pending)
                & (kind >= 0) & is_node
            )
            child_entry = jnp.where(kind > 0, -(a_val + 1), a_val)
            push = any_hit & (sp2 < stack_depth)
            slot = jnp.minimum(sp2, stack_depth - 1)
            stack_ref[slot] = jnp.where(push, child_entry, stack_ref[slot])
            sp2 = sp2 + push.astype(jnp.int32)
        # vector reductions are legal in the BODY but crash Mosaic in the
        # COND — carry the pending count as a scalar instead
        npend = jnp.sum((act_ref[0] & (occ == 0)).astype(jnp.int32))
        return sp2, occ, npend

    def cond(state):
        sp, _occ, npend = state
        return (sp > 0) & (npend > 0)

    npend0 = jnp.sum(act_ref[0].astype(jnp.int32))
    sp0 = jnp.where(npend0 > 0, 1, 0)
    # NOTE: a bool (8,128) in the while carry crashes the Mosaic compiler on
    # this toolchain — carry occupancy as int32 and cast at the end
    occ0 = jnp.zeros((SUBLANES, LANES), dtype=jnp.int32)
    _sp, occ, _n = jax.lax.while_loop(cond, body, (sp0, occ0, npend0))
    occ_ref[0] = occ > 0


def occluded_packets(
    bvh: WideBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    interpret: bool = False,
):
    """Packet occlusion query via the Pallas kernel. Same contract as
    traverse8.occluded. ``interpret=True`` runs the kernel in interpreter
    mode (any backend — the correctness-test path)."""
    n0 = origin.shape[0]
    if active is None:
        active = jnp.ones((n0,), dtype=bool)
    pad = (-n0) % PACKET
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        active = jnp.pad(active, (0, pad))
    n = n0 + pad
    k = n // PACKET
    shape = (k, 3, SUBLANES, LANES)
    o_t = origin.T.reshape(3, k, SUBLANES, LANES).transpose(1, 0, 2, 3)
    d_t = direction.T.reshape(3, k, SUBLANES, LANES).transpose(1, 0, 2, 3)
    safe = jnp.where(jnp.abs(d_t) < 1e-12, jnp.where(d_t < 0, -1e-12, 1e-12), d_t)
    inv_t = 1.0 / safe
    act = active.reshape(k, SUBLANES, LANES)

    kern = functools.partial(
        _occlusion_kernel,
        num_rows=bvh.num_rows,
        stack_depth=int(bvh.stack_depth),
        leaf_size=bvh.leaf_size,
        tmin=tmin,
        tmax=tmax,
    )
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, SUBLANES, LANES), jnp.bool_),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(bvh.table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((int(bvh.stack_depth),), jnp.int32)],
        interpret=interpret,
    )

    occ = fn(bvh.table, o_t, d_t, inv_t, act)
    return occ.reshape(-1)[:n0]
