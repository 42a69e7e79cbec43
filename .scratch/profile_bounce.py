import time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.render.renderer import Renderer
from rust_raytracer_tpu.render import integrator
from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=4, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
r = Renderer(scene, camera, batch_size=1 << 18)

B = 1 << 18
w = camera.image_width
px = jnp.asarray(np.arange(B) % w, jnp.uint32)
py = jnp.asarray((np.arange(B) // w) % camera.image_height, jnp.uint32)
seed = jnp.uint32(0)

def bench(fn, label, reps=3):
    out = np.asarray(fn())
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(fn())
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.0f} ms -> {B/dt/1e3:.1f}k lanes/s")
    return dt

def make(depth, compact):
    def f(pack, px, py, sid, seed):
        ctx = vrng.Ctx(
            pixel=py * np.uint32(w) + px, sample=sid,
            bounce=jnp.uint32(0), seed=seed)
        org, dirn = camera.generate_rays(px, py, sid, ctx, jnp.float32)
        return integrator.trace(r.pack, r.static, org, dirn, ctx, depth,
                                camera.light_bias, compact=compact)
    jf = jax.jit(f)
    sid = jnp.zeros((B,), jnp.uint32)
    return lambda: jf(r.pack, px, py, sid, seed)

d20 = bench(make(20, True), "depth=20 compact=T")
d20n = bench(make(20, False), "depth=20 compact=F")
d5 = bench(make(5, True), "depth=5  compact=T")
d1 = bench(make(1, True), "depth=1  compact=T")
print(f"per-bounce (20-5)/15: {(d20-d5)/15*1e3:.1f} ms")
