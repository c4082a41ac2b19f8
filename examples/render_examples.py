"""Generate the example renders committed under examples/.

Run: python examples/render_examples.py [--big]
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.dirname(os.path.abspath(__file__))


def main(big: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from fovpathtracing_optixcodelatest_tpu.config import (
        FoveationSchedule,
        RenderConfig,
    )
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
    from fovpathtracing_optixcodelatest_tpu.models.material import Material
    from fovpathtracing_optixcodelatest_tpu.models.mesh import make_icosphere
    from fovpathtracing_optixcodelatest_tpu.models.probe import (
        constant_probe,
        gradient_sky_probe,
    )
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.render import simple
    from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer
    from fovpathtracing_optixcodelatest_tpu.utils.image import save_png

    s = 2 if big else 1

    # 1. box_city foveated under a sun sky (the flagship path)
    meshes, cam = scenes.box_city(n=16)
    scene = build_scene(meshes, probe=gradient_sky_probe(sun_power=60.0,
                                                         sun_sharpness=80.0))
    w, h = 320 * s, 180 * s
    # static-showcase variant: accumulate every ring across subframes
    sched = FoveationSchedule.sweep(8, 4, 2)
    sched = FoveationSchedule(
        passes=tuple(dataclasses.replace(p, redraw=False) for p in sched.passes)
    )
    r = Renderer(scene=scene, config=RenderConfig(width=w, height=h),
                 schedule=sched)
    r.set_camera(dataclasses.replace(cam, aspect=w / h))
    frame = None
    for _ in range(16):
        frame = r.render()
    save_png(os.path.join(OUT, "box_city_foveated.png"), frame[::-1])
    print("box_city_foveated.png")

    # 2. cornell, uniform, ambient light
    meshes, cam = scenes.cornell()
    scene = build_scene(meshes, probe=constant_probe((2.5, 2.5, 2.5)))
    w2, h2 = 240 * s, 240 * s
    r = Renderer(scene=scene, config=RenderConfig(width=w2, height=h2),
                 schedule=FoveationSchedule.uniform(8))
    r.set_camera(dataclasses.replace(cam, aspect=1.0))
    for _ in range(16):
        frame = r.render()
    save_png(os.path.join(OUT, "cornell_uniform.png"), frame[::-1])
    print("cornell_uniform.png")

    # 3. 04-twin raycast with shadow + texture
    from fovpathtracing_optixcodelatest_tpu.models.mesh import make_box, make_quad
    from fovpathtracing_optixcodelatest_tpu.models.texture import checkerboard

    floor = make_quad((-8, 0, 8), (8, 0, 8), (8, 0, -8), (-8, 0, -8),
                      Material(color=(0.9, 0.9, 0.9), emission=(0, 0, 0)),
                      texture_id=0)
    box = make_box((0, 1, 0), (1, 1, 1),
                   Material(color=(0.9, 0.3, 0.2), emission=(0, 0, 0)))
    ball = make_icosphere((2.5, 0.8, 1.5), 0.8, 3,
                          Material(color=(0.2, 0.4, 0.9), emission=(0, 0, 0)))
    rscene = build_scene([floor, box, ball],
                         texture_images=[checkerboard(64, 8)])
    rcam = Camera(eye=(5, 4, 7), lookat=(0, 0.5, 0), fov_y=45.0,
                  aspect=320 / 240)
    frame = np.asarray(
        simple.raycast(rscene, rcam.device_params(), 320 * s, 240 * s,
                       light_pos=(6, 12, 4))
    )
    save_png(os.path.join(OUT, "raycast_04_twin.png"), frame[::-1])  # V-up flip
    print("raycast_04_twin.png")

    # 4. spectral dispersion through a glass sphere — the FULL hero-wavelength
    # path tracer through the product film (config.spectral=True), not the
    # old direct-lighting spectral_render demo
    glass = Material(color=(1, 1, 1), emission=(0, 0, 0), metallic=0.0,
                     roughness=0.05, transmission=1.0, eta=1.5)
    gscene = build_scene(
        [make_icosphere((0, 0, 0), 1.0, 3, glass)],
        probe=gradient_sky_probe(sun_power=30.0, sun_sharpness=40.0),
    )
    gcam = Camera(eye=(0, 0.4, 3.4), lookat=(0, 0, 0), fov_y=42.0,
                  aspect=1.0)
    r = Renderer(
        scene=gscene,
        config=RenderConfig(width=240 * s, height=240 * s, spectral=True,
                            dispersion=25000.0),
        schedule=FoveationSchedule.uniform(4),
    )
    r.set_camera(gcam)
    for _ in range(4):
        frame = r.render()
    save_png(os.path.join(OUT, "spectral_glass.png"), frame[::-1])
    print("spectral_glass.png")


if __name__ == "__main__":
    main(big="--big" in sys.argv)
