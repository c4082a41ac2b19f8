"""Compute ops: geometry sampling, BSDF, probe MIS, intersection, BVH traversal,
tone mapping. All functions are pure, vectorized over a leading batch dimension,
and jit/vmap/shard_map-safe (static shapes, no Python control flow on traced
values)."""
