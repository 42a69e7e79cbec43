"""Profile step components on a REAL steady-state pool wavefront."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import pool as poolmod
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=2, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
pack, static = sc.compile_scene(scene)
n_pixels = camera.image_width * camera.image_height
total = n_pixels * 2
N = 1 << 18

step = poolmod.make_step(pack, static, camera, total, 2, 0)
state = poolmod.init_state(N, n_pixels)
for i in range(30):
    state = step(pack, state)
jax.block_until_ready(state.accum)
print("steady state reached; active", int(jnp.sum(state.active)), flush=True)

org, dirn, alive = state.org, state.dirn, state.active
bounce = np.asarray(state.bounce)
print("bounce histogram:", np.bincount(bounce, minlength=20)[:20], flush=True)

def bench(f, label, reps=5):
    o = jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(o)
    print(f"{label:34s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)

tmax = jnp.where(alive, 3.4e38, 0.0).astype(jnp.float32)
k = jax.jit(lambda o, d, tm: pb8.intersect_triangles_bvh8(pack, o, d, 1e-3, tm))
bench(lambda: k(org, dirn, tmax), "bvh8 kernel (pool order)")

ctx = vrng.Ctx(pixel=state.pixel, sample=state.sample, bounce=state.bounce,
               seed=jnp.uint32(0))
sv = jax.jit(lambda o, d, a: integ.shade_vertex(pack, static, o, d, ctx, 0.25, a))
bench(lambda: sv(org, dirn, alive), "shade_vertex (pool order)")

# scatter-add cost
rad = jnp.ones((N, 3), jnp.float32)
acc0 = jnp.zeros((n_pixels, 3), jnp.float32)
scat = jax.jit(lambda a, p, r: a.at[p].add(r, mode="drop"))
bench(lambda: scat(acc0, state.pixel, rad), "scatter-add 256k->1.44M")

# argsort cost
srt = jax.jit(lambda o, d, a: jnp.argsort(integ._compaction_key(o, d, a)))
bench(lambda: srt(org, dirn, alive), "compaction argsort 256k")

# regen cost (camera rays for all lanes)
ctx0 = vrng.Ctx(pixel=state.pixel, sample=state.sample, bounce=jnp.uint32(0),
                seed=jnp.uint32(0))
px = state.pixel % np.uint32(camera.image_width)
py = state.pixel // np.uint32(camera.image_width)
cr = jax.jit(lambda px, py, s: camera.generate_rays(px, py, s, ctx0, jnp.float32))
bench(lambda: cr(px, py, state.sample), "camera.generate_rays 256k")

np.savez("/root/repo/.scratch/steady_state.npz",
         org=np.asarray(org), dirn=np.asarray(dirn),
         alive=np.asarray(alive), bounce=bounce,
         pixel=np.asarray(state.pixel), sample=np.asarray(state.sample))
print("saved steady_state.npz", flush=True)

# full pool step + wavefront kernel + compaction-sort pieces (r4)
bench(lambda: step(pack, state), "FULL pool step")
from rust_raytracer_tpu.ops import pallas_wavefront as pwf
kw = jax.jit(lambda o, d, tm: pwf.intersect_triangles_wavefront(pack, o, d, 1e-3, tm))
bench(lambda: kw(org, dirn, tmax), "wavefront kernel (pool order)")
key = jax.jit(lambda o, d, a: jnp.argsort(integ._compaction_key(o, d, a)))
bench(lambda: key(org, dirn, alive), "compaction key+argsort")

# permutation-apply cost (the 10-array gather by perm)
perm = key(org, dirn, alive)
ap = jax.jit(lambda p, *arrs: tuple(a[p] for a in arrs))
bench(lambda: ap(perm, state.org, state.dirn, state.throughput,
                 state.radiance, state.pixel, state.sample, state.bounce,
                 state.active), "apply perm to 8 state arrays")

# camera regen
px = state.pixel % np.uint32(camera.image_width)
py = state.pixel // np.uint32(camera.image_width)
cg = jax.jit(lambda px, py, s: camera.generate_rays(px, py, s, ctx, jnp.float32))
bench(lambda: cg(px, py, state.sample), "camera.generate_rays")
