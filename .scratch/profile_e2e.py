import os, time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.render.renderer import Renderer
from rust_raytracer_tpu.render import integrator
from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.utils import config as cfg

t0=time.time()
scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=4, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
r = Renderer(scene, camera, batch_size=1 << 18)
print(f"scene build {time.time()-t0:.1f}s")

B = 1 << 18
w = camera.image_width
px = jnp.asarray(np.arange(B) % w, jnp.uint32)
py = jnp.asarray((np.arange(B) // w) % camera.image_height, jnp.uint32)
seed = jnp.uint32(0)

def make(depth, compact=True):
    def f(pack, px, py, sid, seed):
        ctx = vrng.Ctx(pixel=py * np.uint32(w) + px, sample=sid,
                       bounce=jnp.uint32(0), seed=seed)
        org, dirn = camera.generate_rays(px, py, sid, ctx, jnp.float32)
        return integrator.trace(r.pack, r.static, org, dirn, ctx, depth,
                                camera.light_bias, compact=compact)
    jf = jax.jit(f)
    return jf

def bench(depth, compact=True, reps=2):
    jf = make(depth, compact)
    sid0 = jnp.zeros((B,), jnp.uint32)
    t0 = time.time()
    out = np.asarray(jf(r.pack, px, py, sid0, seed))
    compile_s = time.time() - t0
    t0 = time.time()
    for k in range(reps):
        out = np.asarray(jf(r.pack, px, py, jnp.full((B,), k+1, jnp.uint32), seed))
    dt = (time.time()-t0)/reps
    print(f"depth={depth} compact={compact}: compile {compile_s:.1f}s  run {dt*1e3:.0f} ms  {B/dt/1e3:.0f}k px-s/s")
    return dt

d20 = bench(20)
d4 = bench(4)
print(f"per-bounce marginal (20-4)/16: {(d20-d4)/16*1e3:.1f} ms")
