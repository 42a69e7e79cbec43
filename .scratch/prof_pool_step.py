"""Measure the FULL pool step on TPU at bench config, with ablations:
compact on/off, scatter on/off, regen on/off — find the hidden cost."""
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import pool as poolmod
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=2, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
pack, static = sc.compile_scene(scene)
n_pixels = camera.image_width * camera.image_height
spp = 2
total = n_pixels * spp
N = 1 << 18

def run_steps(step, n_warm, n_time, label):
    state = poolmod.init_state(N, n_pixels)
    t0 = time.time()
    state = step(pack, state)
    jax.block_until_ready(state.accum)
    print(f"{label}: compile+1 {time.time()-t0:.1f}s", flush=True)
    for _ in range(n_warm):
        state = step(pack, state)
    jax.block_until_ready(state.accum)
    t0 = time.time()
    for _ in range(n_time):
        state = step(pack, state)
    jax.block_until_ready(state.accum)
    dt = (time.time() - t0) / n_time
    print(f"{label}: {dt*1e3:.1f} ms/step  (issued {int(jnp.sum(state.next_flat))})", flush=True)
    return dt

# full step (production)
step_full = poolmod.make_step(pack, static, camera, total, spp, 0)
run_steps(step_full, 25, 10, "full step (steady)")

# no compaction sort
step_nc = poolmod.make_step(pack, static, camera, total, spp, 0, compact=False)
run_steps(step_nc, 25, 10, "no-compact step")
