"""In-context full-step timing of sort_impl x scatter_cap combos."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import pool as poolmod
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=8, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
pack, static = sc.compile_scene(scene)
n_pixels = camera.image_width * camera.image_height
total = n_pixels * 8
N = 1 << 18

for sort_impl in ("argsort", "multisort"):
    for cap in (0, 65536):
        step = poolmod.make_step(pack, static, camera, total, 8, 0,
                                 sort_impl=sort_impl, scatter_cap=cap)
        state = poolmod.init_state(N, n_pixels)
        for i in range(30):
            state = step(pack, state)
        jax.block_until_ready(state.accum)
        best = 1e9
        for trial in range(3):
            t0 = time.time()
            for i in range(10):
                state = step(pack, state)
            jax.block_until_ready(state.accum)
            best = min(best, (time.time() - t0) / 10)
        print(f"RESULT step sort={sort_impl:9s} cap={cap:6d}: "
              f"{best*1e3:7.1f} ms  (issued {int(jnp.sum(state.next_flat))})",
              flush=True)
        del state
