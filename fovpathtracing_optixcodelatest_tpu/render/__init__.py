"""Rendering layer: ray generation, the wavefront path-tracing integrator,
film/accumulation, foveated pass assembly, and the Renderer front-end."""
