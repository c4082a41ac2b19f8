"""fovpathtracing_optixcodelatest_tpu — a TPU-native foveated path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference OptiX
codebase ``bipul-mohanto/fovPathTracing_optixCodeLatest`` ("FovTiX"): gaze-contingent
foveated Monte-Carlo path tracing with a Disney BSDF, environment-probe importance
sampling (MIS) + next-event estimation, progressive accumulation, and exposure +
Reinhard tone mapping.

Architecture (TPU-first, not a port):

- Scenes are pytrees of flat SoA arrays (triangles / materials / textures / probe),
  the analog of the reference's ``LaunchParams`` + ``TriangleMeshSBTData`` ABI
  (reference: PT_sv5_/LaunchParams.h).
- Ray traversal runs against a host-built BVH flattened to a *stackless threaded*
  layout (hit-link / miss-link), so a traversal step is one gather + AABB test per
  ray with a single int32 of control state — lockstep-friendly for the VPU, instead
  of OptiX's hardware BVH + SBT dispatch (reference: deviceProgram.cu optixTrace).
- Shading is vectorized pure-function Disney BSDF + probe MIS over the whole ray
  batch; the bounce loop is a ``lax.scan`` with done-masking (wavefront, not
  megakernel).
- Foveation is three statically-shaped ray batches (stride 4/2/1, spp 8/16/32 around
  the gaze point) whose results are block-replicated with ``jnp.repeat`` and
  composited with ring masks — scatter-free and race-free by construction
  (reference: SimplePathtracer.cpp:137-209, deviceProgram.cu:546-616).
- Multi-chip scaling shards the ray batch across a ``jax.sharding.Mesh`` and
  assembles frames with ``psum`` over ICI (design twin: sutil/WorkDistribution.h).
"""

__version__ = "0.1.0"

from fovpathtracing_optixcodelatest_tpu.config import (  # noqa: F401
    FoveationPass,
    FoveationSchedule,
    RenderConfig,
)
