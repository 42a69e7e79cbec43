import os, time
import numpy as np
import jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.render import pool as poolmod
from rust_raytracer_tpu.render.renderer import Renderer
from rust_raytracer_tpu.utils import config as cfg

t0 = time.time()
scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=4, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
r = Renderer(scene, camera, batch_size=1 << 18)
print(f"build {time.time()-t0:.1f}s")
n_pixels = camera.image_width * camera.image_height

import sys
for lanes_pow in (int(sys.argv[1]),):
    lanes = 1 << lanes_pow
    spp = 2
    t0 = time.time()
    accum = poolmod.render_pool(r.pack, r.static, camera, n_pixels, spp, lanes,
                                seed=0)
    s = float(jnp.sum(accum))  # force
    dt = time.time() - t0
    total = n_pixels * spp
    # second run (warm)
    t0 = time.time()
    accum = poolmod.render_pool(r.pack, r.static, camera, n_pixels, spp, lanes,
                                seed=1)
    s = float(jnp.sum(accum))
    dt2 = time.time() - t0
    print(f"lanes 2^{lanes_pow}: cold {dt:.1f}s warm {dt2:.1f}s -> {total/dt2/1e3:.0f}k px-s/s  vs_baseline {total/dt2/0.59e6:.2f}")
