"""Time each part of a pool step on the captured bounce-3 wavefront."""
import time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.ops import shade as shd
from rust_raytracer_tpu.ops import texture as tex
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.core import rng as vrng

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load('/root/repo/.scratch/wavefronts.npz')
DEPTH = 3
org = jnp.asarray(d[f'o{DEPTH}']); dirn = jnp.asarray(d[f'd{DEPTH}'])
alive = jnp.asarray(d[f'a{DEPTH}'])
B = org.shape[0]
ctx = vrng.Ctx(pixel=jnp.arange(B, dtype=jnp.uint32),
               sample=jnp.zeros((B,), jnp.uint32),
               bounce=jnp.uint32(DEPTH), seed=jnp.uint32(0))

def bench(f, label, reps=10):
    o = jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(o)
    dt = (time.time()-t0)/reps
    print(f"{label:40s} {dt*1e3:8.1f} ms")
    return dt

# sort
sort = jax.jit(lambda o, dd, a: jnp.argsort(integ._compaction_key(o, dd, a)))
bench(lambda: sort(org, dirn, alive), "sort key+argsort")
perm = sort(org, dirn, alive)
so, sd = jax.block_until_ready(org[perm]), jax.block_until_ready(dirn[perm])
salive = alive[perm]

tmax = jnp.where(salive, 3.4e38, 1e-3).astype(jnp.float32)
k = jax.jit(lambda o, dd, tm: pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))
bench(lambda: k(so, sd, tmax), "bvh8 kernel (sorted)")
bench(lambda: k(org, dirn, jnp.where(alive, 3.4e38, 1e-3).astype(jnp.float32)), "bvh8 kernel (UNsorted)")

full = jax.jit(lambda o, dd: isect.intersect(pack, o, dd, 1e-3, ctx, alive=salive))
bench(lambda: full(so, sd), "full intersect")
hit = jax.block_until_ready(full(so, sd))

attrf = jax.jit(lambda o, dd: isect.hit_attributes(pack, o, dd, hit))
bench(lambda: attrf(so, sd), "hit_attributes")
attr = attrf(so, sd)

texf = jax.jit(lambda uv, pos: tex.eval_program(static.tex_program, pack.tex_data, uv, pos))
bench(lambda: texf(attr.uv, attr.pos), "texture program")
tv = texf(attr.uv, attr.pos)

shadef = jax.jit(lambda o, dd: shd.shade(pack, static.light_list, tv, o, dd, hit, attr, ctx, 0.25))
bench(lambda: shadef(so, sd), "shade")

step_all = jax.jit(lambda o, dd: integ.shade_vertex(pack, static, o, dd, ctx, 0.25, salive))
bench(lambda: step_all(so, sd), "shade_vertex total")
