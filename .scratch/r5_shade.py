"""Break down shade_vertex non-traversal cost on the steady wavefront."""
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
d = np.load("/root/repo/.scratch/steady_r5.npz")
org = jnp.asarray(d["org"], jnp.float32)
dirn = jnp.asarray(d["dirn"], jnp.float32)
alive = jnp.asarray(d["alive"])
pixel = jnp.asarray(d["pixel"]); sample = jnp.asarray(d["sample"])
bounce = jnp.asarray(d["bounce"])
N = org.shape[0]
ctx = vrng.Ctx(pixel=pixel, sample=sample, bounce=bounce, seed=jnp.uint32(0))

def bench(f, label, reps=8):
    o = f(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.time()-t0)/reps)
    print(f"RESULT {label:40s} {best*1e3:8.1f} ms", flush=True)

sv = jax.jit(lambda o, d_, a: integ.shade_vertex(pack, static, o, d_, ctx, 0.25, a))
bench(lambda: sv(org, dirn, alive), "shade_vertex total")

# stage: intersect only
iso = jax.jit(lambda o, d_, a: isect.intersect(pack, o, d_, 1e-3, ctx, alive=a))
bench(lambda: iso(org, dirn, alive), "intersect (all prims)")

# intersect + attrs
@jax.jit
def upto_attrs(o, d_, a):
    hit = isect.intersect(pack, o, d_, 1e-3, ctx, alive=a)
    hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
    return isect.hit_attributes(pack, o, d_, hit)
bench(lambda: upto_attrs(org, dirn, alive), "intersect + hit_attributes")

# + texture program
@jax.jit
def upto_tex(o, d_, a):
    hit = isect.intersect(pack, o, d_, 1e-3, ctx, alive=a)
    hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
    attr = isect.hit_attributes(pack, o, d_, hit)
    return tex.eval_program(static.tex_program, pack.tex_data, attr.uv,
                            attr.pos, tex_const=pack.tex_const)
bench(lambda: upto_tex(org, dirn, alive), "+ texture program")

# ---- packed attr-table experiment: one (T, 32) gather vs 11 narrow ----
T = pack.tri_v0.shape[0]
tri_attr = np.zeros((T, 32), np.float32)
tri_attr[:, 0:3] = np.asarray(pack.tri_v0)
tri_attr[:, 3:6] = np.asarray(pack.tri_e1)
tri_attr[:, 6:9] = np.asarray(pack.tri_e2)
tri_attr[:, 9:12] = np.asarray(pack.tri_n0)
tri_attr[:, 12:15] = np.asarray(pack.tri_n1)
tri_attr[:, 15:18] = np.asarray(pack.tri_n2)
tri_attr[:, 18:20] = np.asarray(pack.tri_uv0)
tri_attr[:, 20:22] = np.asarray(pack.tri_uv1)
tri_attr[:, 22:24] = np.asarray(pack.tri_uv2)
tri_attr[:, 24] = np.asarray(pack.tri_has_uv)
tri_attr[:, 25] = np.asarray(pack.tri_mat)
tri_attr = jnp.asarray(tri_attr)
print("tri_attr MB:", tri_attr.size * 4 / 1e6, flush=True)

import rust_raytracer_tpu.core.math as vmath

@jax.jit
def attrs_packed(o, d_, a):
    hit = isect.intersect(pack, o, d_, 1e-3, ctx, alive=a)
    hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
    prim = jnp.maximum(hit.prim, 0)
    row = tri_attr[prim]            # ONE (N, 32) gather
    v0 = row[:, 0:3]; e1 = row[:, 3:6]; e2 = row[:, 6:9]
    n0 = row[:, 9:12]; n1 = row[:, 12:15]; n2 = row[:, 15:18]
    uv0 = row[:, 18:20]; uv1 = row[:, 20:22]; uv2 = row[:, 22:24]
    has_uv = row[:, 24] > 0.5
    mat = row[:, 25].astype(jnp.int32)
    # triangle attr math (same as hit_attributes' tri branch)
    pvec = jnp.cross(d_, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    bvec = o - v0
    bu = jnp.sum(bvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(bvec, e1)
    bv = jnp.sum(d_ * qvec, axis=-1) * inv_det
    bw = 1.0 - bu - bv
    t_n = n0 * bw[:, None] + n1 * bu[:, None] + n2 * bv[:, None]
    t_uv = uv0 * bw[:, None] + uv1 * bu[:, None] + uv2 * bv[:, None]
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    e1perp = jnp.cross(t_n, e1)
    e2perp = jnp.cross(e2, t_n)
    tan = e2perp * duv1[:, 0:1] + e1perp * duv2[:, 0:1]
    bit = e2perp * duv1[:, 1:2] + e1perp * duv2[:, 1:2]
    t_tri = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return t_n, t_uv, tan, bit, t_tri, mat, has_uv

bench(lambda: attrs_packed(org, dirn, alive), "intersect + PACKED tri attrs")
