import time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import shade as shd
from rust_raytracer_tpu.ops import texture as tex
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.core import rng as vrng

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)

B = 1 << 18
rng = np.random.default_rng(0)
org = rng.uniform(0, 555, (B, 3)).astype(np.float32)
dirn = rng.normal(size=(B, 3)).astype(np.float32)
key = np.asarray(integ._compaction_key(jnp.asarray(org), jnp.asarray(dirn), jnp.ones((B,), bool)))
k = np.argsort(key)
org_j, dirn_j = jnp.asarray(org[k]), jnp.asarray(dirn[k])
alive = jnp.ones((B,), bool)
ctx = vrng.Ctx(pixel=jnp.arange(B, dtype=jnp.uint32),
               sample=jnp.zeros((B,), jnp.uint32),
               bounce=jnp.uint32(3), seed=jnp.uint32(0))

def timeit(f, label, *a, reps=3):
    t0 = time.time(); _ = np.asarray(f(*a)); comp = time.time()-t0
    t0 = time.time()
    for _ in range(reps): r = np.asarray(f(*a))
    dt = (time.time()-t0)/reps - 0.025
    print(f"{label}: compile {comp:.1f}s  run {dt*1e3:.1f} ms")

def s(x): return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))

@jax.jit
def f_sortkey(o, d):
    perm = jnp.argsort(integ._compaction_key(o, d, alive))
    return jnp.sum(perm)
timeit(f_sortkey, "key+argsort", org_j, dirn_j)

@jax.jit
def f_intersect(o, d):
    h = isect.intersect(pack, o, d, 1e-3, ctx, alive=alive)
    return s(h.t) + jnp.sum(h.kind) + jnp.sum(h.prim)
timeit(f_intersect, "intersect full", org_j, dirn_j)

@jax.jit
def f_attr(o, d):
    h = isect.intersect(pack, o, d, 1e-3, ctx, alive=alive)
    a = isect.hit_attributes(pack, o, d, h)
    return s(a.pos) + s(a.normal) + s(a.uv)
timeit(f_attr, "intersect+attributes", org_j, dirn_j)

@jax.jit
def f_bounce(o, d):
    r = integ.trace(pack, static, o, d, ctx, 1, 0.25, compact=False)
    return s(r)
timeit(f_bounce, "1 bounce no-sort", org_j, dirn_j)

@jax.jit
def f_bounce_s(o, d):
    r = integ.trace(pack, static, o, d, ctx, 1, 0.25, compact=True)
    return s(r)
timeit(f_bounce_s, "1 bounce with sort", org_j, dirn_j)
