"""Fused bounce-shading Pallas kernel — MEASURED NEGATIVE RESULT (round 3).

One kernel evaluates the ENTIRE occlusion-independent shading block of a
bounce (ops/shading_core.shade_core: probe-NEE with MIS + Disney eval/pdf/
sample + medium tracking) in a single pass over VMEM blocks. The hypothesis:
the jnp path lowers the same math to ~40 separate XLA fusions with HBM
round-trips and T(1,128)/T(4,128) layouts between them — ~70 ms/frame at
1.5M rays on a v5e — while the kernel's floor is the ~360 B/lane of packed
input/output traffic plus VPU math.

Frame-scale A/B at the bench config (960x540 fov 32/16/8, box_city n=24,
v5e, scratch/r3e_fused_ab.py, 2026-08-19) FALSIFIED it:

  committed (N,3) XLA integrator     453 ms / 8.77 Mrays/s
  plane-wise shade_core through XLA  492 ms / 8.07 Mrays/s
  this kernel (fused shading)        693 ms / 5.73 Mrays/s

The 79-plane stack/pad/reshape on the way in and the 26-plane unpack on the
way out are themselves HBM round trips (~420 B/lane each way) that XLA
cannot fuse across the pallas_call boundary, and they cost MORE than the
fusion-fragmentation they remove; the plane-wise relayout alone costs ~8%.
XLA's own fusion of stacked (N,3) shading math is already within ~15% of
the kernel's theoretical win, with zero marshalling. Kept (with the CPU
interpret-mode parity test, tests/test_fused_shading.py) as the documented
dead end; render/integrator.py deliberately does NOT call it.
PLAN.md rule 32 records the numbers.

Layout: every logical (N,) plane is one row of a packed (K, R, 128) f32
tensor (N padded to R*128, R padded to a block multiple). The kernel grid
walks R in BLK-row blocks; inputs arrive as one (K_IN, BLK, 128) VMEM block
(static leading-index slices = free), outputs leave as (K_OUT, BLK, 128)
plus an i32 flag plane (occl_query | sample_ok<<1 | is_catcher<<2).

Gathers (tri_pack row, probe alias row, texels) stay in XLA — Mosaic has no
per-lane VMEM gather (the round-2/3 kill criterion for fused traversal);
shading needs none once its rows are in hand.

Used only for non-spectral, non-instanced, non-demand scenes with packed
probe sample rows (render/integrator.py gates); everything else runs the
identical shade_core through XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# demoted to scratch/ in round 5 (negative result, PLAN.md rule 32); the
# plane-wise math body moved with it
import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "deadend_shading_core",
    _os.path.join(_os.path.dirname(__file__), "deadend_shading_core.py"),
)
sc = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(sc)

BLK = 64  # block rows: 64*128 = 8192 lanes/block, ~3 MB in + 1 MB out

# input plane order: o(3) d(3) thru(3) eta(1) uni(8) probe_g(13) attr(48)
_K_IN = 3 + 3 + 3 + 1 + 8 + 13 + 48
# output plane order: t p(3) wi(3) l_dir(3) tl(3) emission(3) new_thru(3)
# eta_out [normal(3) albedo(3)]
_K_OUT = 1 + 3 + 3 + 3 + 3 + 3 + 3 + 1


def _kernel(fin_ref, hit_ref, fout_ref, flags_ref, *, probe_w, probe_h,
            tmin, tmax, need_aov):
    a = [fin_ref[i] for i in range(_K_IN)]
    o = tuple(a[0:3])
    d = tuple(a[3:6])
    thru = tuple(a[6:9])
    eta_in = a[9]
    uni = tuple(a[10:18])
    probe_g = tuple(a[18:31])
    attr = tuple(a[31:79])
    hit_mask = hit_ref[:] != 0

    out = sc.shade_core(
        o, d, attr, probe_g, uni, thru, eta_in, hit_mask,
        probe_w, probe_h, tmin, tmax, need_aov=need_aov,
    )

    cols = (
        [out["t"]] + list(out["p"]) + list(out["wi"]) + list(out["l_dir"])
        + list(out["tl"]) + list(out["emission"]) + list(out["new_thru"])
        + [out["eta_out"]]
    )
    if need_aov:
        cols += list(out["normal"]) + list(out["albedo"])
    for i, c in enumerate(cols):
        fout_ref[i] = c
    flags_ref[:] = (
        out["occl_query"].astype(jnp.int32)
        | (out["sample_ok"].astype(jnp.int32) << 1)
        | (out["is_catcher"].astype(jnp.int32) << 2)
        | (out["transmitted"].astype(jnp.int32) << 3)
    )


@functools.partial(
    jax.jit,
    static_argnames=("probe_w", "probe_h", "tmin", "tmax", "need_aov",
                     "interpret"),
)
def shade_fused(
    o, d, thru, eta_in, uni, probe_g, attr, hit_mask,
    probe_w: int, probe_h: int, tmin: float, tmax: float,
    need_aov: bool = False, interpret: bool = False,
):
    """Planes in, planes out — the fused twin of shade_core for nch=3.

    Args are (N,) planes (tuples for o/d/thru/uni/probe_g/attr); returns the
    shade_core dict restricted to what the RGB integrator consumes.
    """
    n = o[0].shape[0]
    planes = (list(o) + list(d) + list(thru) + [eta_in] + list(uni)
              + list(probe_g) + list(attr))
    assert len(planes) == _K_IN
    rpad = (-n) % (BLK * 128)
    fin = jnp.stack([jnp.pad(p.astype(jnp.float32), (0, rpad)) for p in planes])
    r = (n + rpad) // 128
    fin = fin.reshape(_K_IN, r, 128)
    hit_i = jnp.pad(hit_mask.astype(jnp.int32), (0, rpad)).reshape(r, 128)

    k_out = _K_OUT + (6 if need_aov else 0)
    grid = (r // BLK,)
    fout, flags = pl.pallas_call(
        functools.partial(
            _kernel, probe_w=probe_w, probe_h=probe_h, tmin=tmin, tmax=tmax,
            need_aov=need_aov,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_K_IN, BLK, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_out, BLK, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_out, r, 128), jnp.float32),
            jax.ShapeDtypeStruct((r, 128), jnp.int32),
        ],
        interpret=interpret,
    )(fin, hit_i)

    fo = fout.reshape(k_out, r * 128)[:, :n]
    fl = flags.reshape(r * 128)[:n]
    out = {
        "t": fo[0],
        "p": (fo[1], fo[2], fo[3]),
        "wi": (fo[4], fo[5], fo[6]),
        "l_dir": (fo[7], fo[8], fo[9]),
        "tl": (fo[10], fo[11], fo[12]),
        "emission": (fo[13], fo[14], fo[15]),
        "new_thru": (fo[16], fo[17], fo[18]),
        "eta_out": fo[19],
        "occl_query": (fl & 1) != 0,
        "sample_ok": (fl & 2) != 0,
        "is_catcher": (fl & 4) != 0,
        "transmitted": (fl & 8) != 0,
    }
    if need_aov:
        out["normal"] = (fo[20], fo[21], fo[22])
        out["albedo"] = (fo[23], fo[24], fo[25])
    return out
