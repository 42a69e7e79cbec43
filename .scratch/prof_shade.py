"""Break down shade_vertex cost on the steady-state wavefront."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import shade as shd
from rust_raytracer_tpu.ops import texture as tex
from rust_raytracer_tpu.core import rng as vrng

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load("/root/repo/.scratch/steady_state.npz")
org = jnp.asarray(d["org"]); dirn = jnp.asarray(d["dirn"]); alive = jnp.asarray(d["alive"])
perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
org, dirn, alive = org[perm], dirn[perm], alive[perm]
N = org.shape[0]
ctx = vrng.Ctx(pixel=jnp.arange(N, dtype=jnp.uint32),
               sample=jnp.zeros(N, jnp.uint32), bounce=jnp.uint32(1),
               seed=jnp.uint32(0))

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps):
        o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"RESULT {label:34s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return o

full = jax.jit(lambda o, d, a: integ.shade_vertex(pack, static, o, d, ctx, 0.25, a))
bench(full, "shade_vertex total", org, dirn, alive)

isect_only = jax.jit(lambda o, d, a: isect.intersect(pack, o, d, 1e-3, ctx, alive=a))
hit = bench(isect_only, "intersect (all prims)", org, dirn, alive)

hit_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
attr_f = jax.jit(lambda o, d, h: isect.hit_attributes(pack, o, d, h))
attr = bench(attr_f, "hit_attributes", org, dirn, hit_sg)

tex_f = jax.jit(lambda uv, pos: tex.eval_program(
    static.tex_program, pack.tex_data, uv, pos, tex_const=pack.tex_const))
tv = bench(tex_f, "tex program", attr.uv, attr.pos)

shade_f = jax.jit(lambda o, d, h, a, t: shd.shade(
    pack, static.light_list, t, o, d, h, a, ctx, 0.25))
bench(shade_f, "shade (NEE + scatter)", org, dirn, hit_sg, attr, tv)
