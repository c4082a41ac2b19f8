"""Multi-chip scaling: device-mesh sharding of the render workload + stereo.

The reference shipped (unused) multi-GPU scaffolding — StaticWorkDistribution
tile strips (sutil/WorkDistribution.h:34-91) and ZERO_COPY/P2P output buffers
(CUDAOutputBuffer.h:45-51). Here multi-chip is first-class: the sample
dimension shards across a ``jax.sharding.Mesh`` under ``shard_map`` with a
``psum`` to assemble per-pixel sums over ICI (rendering is embarrassingly
parallel across samples; scene data is replicated per chip)."""
