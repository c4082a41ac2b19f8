"""Scene data layer: materials, meshes, textures, probes, cameras, loaders.

Everything here produces pytrees of flat SoA device arrays — the TPU-native
equivalent of the reference's SBT records + CUDA buffers (LaunchParams.h,
Model.cpp, Probe.h). Host-side work (parsing, CDF builds, BVH input prep) is
plain numpy.
"""
