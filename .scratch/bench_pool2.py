import os, time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.render import pool as poolmod
from rust_raytracer_tpu.render.renderer import Renderer
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=4, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
r = Renderer(scene, camera, batch_size=1 << 18)
n_pixels = camera.image_width * camera.image_height

lanes = 1 << 18
spp = 2
total = n_pixels * spp
state = poolmod.init_state(lanes, n_pixels)
step = poolmod.make_step(r.pack, r.static, camera, total, spp, 0)
state = step(r.pack, state)  # compile
print("compiled")
t_all = time.time()
for k in range(80):
    t0 = time.time()
    state = step(r.pack, state)
    na = int(jnp.sum(state.active.astype(jnp.int32)))  # sync
    dt = time.time() - t0
    if k % 4 == 0 or na == 0:
        print(f"step {k}: {dt*1e3:.0f} ms  active {na/lanes*100:.0f}%  issued {int(state.next_flat)/total*100:.0f}%")
    if na == 0 and int(state.next_flat) >= total:
        break
print(f"total {time.time()-t_all:.1f}s for {total/1e6:.1f}M samples")
