import time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.core import rng as vrng

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)

B = 1 << 18
rng = np.random.default_rng(0)
# bounce-like rays: origins on walls/objects in box, cosine dirs
org = rng.uniform(0, 555, (B, 3)).astype(np.float32)
dirn = rng.normal(size=(B, 3)).astype(np.float32)
org_j, dirn_j = jnp.asarray(org), jnp.asarray(dirn)
alive = jnp.ones((B,), bool)

ctx = vrng.Ctx(pixel=jnp.arange(B, dtype=jnp.uint32),
               sample=jnp.zeros((B,), jnp.uint32),
               bounce=jnp.uint32(3), seed=jnp.uint32(0))

def bench(f, label, reps=5):
    t0 = time.time()
    o = f(); jax.tree_util.tree_map(lambda x: np.asarray(x), o)
    comp = time.time()-t0
    t0 = time.time()
    for _ in range(reps):
        o = f(); jax.tree_util.tree_map(lambda x: np.asarray(x), o)
    dt = (time.time()-t0)/reps
    print(f"{label}: compile+1st {comp:.1f}s", end="  ")
    print(f"{label}: {dt*1e3:.1f} ms")
    return dt

# 1. compaction key + argsort + gather of state
def sort_fn(org, dirn, alive):
    perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
    return org[perm], dirn[perm], perm
jsort = jax.jit(sort_fn)
bench(lambda: jsort(org_j, dirn_j, alive), "sort(key+argsort+gather)")

# sorted rays for the rest
so, sd, _ = jsort(org_j, dirn_j, alive)
so = jax.block_until_ready(so)

# 2. full intersect
jint = jax.jit(lambda o, d: isect.intersect(pack, o, d, 1e-3, ctx, alive=alive))
bench(lambda: jint(so, sd), "intersect(full, sorted)")

# 2b. spheres+planes only
def sp_only(o, d):
    inf = jnp.full((B,), jnp.inf, jnp.float32)
    ts, _ = isect.intersect_spheres(pack, o, d, jnp.full((B,),1e-3,jnp.float32), inf)
    tp, _ = isect.intersect_planes(pack, o, d, jnp.full((B,),1e-3,jnp.float32), inf)
    return ts, tp
bench(jax.jit(lambda: sp_only(so, sd)), "spheres+planes only")

# 2c. triangles with wall-bounded tmax vs inf
def tri_only(o, d, bound):
    inf = jnp.full((B,), jnp.inf, jnp.float32)
    if bound:
        ts, _ = isect.intersect_spheres(pack, o, d, jnp.full((B,),1e-3,jnp.float32), inf)
        tp, _ = isect.intersect_planes(pack, o, d, jnp.full((B,),1e-3,jnp.float32), inf)
        tm = jnp.minimum(ts, tp)
    else:
        tm = inf
    return isect.intersect_triangles(pack, o, d, jnp.full((B,),1e-3,jnp.float32), tm)
bench(jax.jit(lambda: tri_only(so, sd, False)), "triangles tmax=inf")
bench(jax.jit(lambda: tri_only(so, sd, True)), "triangles tmax=wall")

# 3. one full bounce body including shading/NEE
from functools import partial
def one_bounce(o, d):
    return integ.trace(pack, static, o, d, ctx, 1, 0.25, compact=False)
jb = jax.jit(one_bounce); bench(lambda: jb(so, sd), "full bounce (no sort)")

def one_bounce_sorted(o, d):
    return integ.trace(pack, static, o, d, ctx, 1, 0.25, compact=True)
jb2 = jax.jit(one_bounce_sorted); bench(lambda: jb2(org_j, dirn_j), "full bounce (with sort)")
