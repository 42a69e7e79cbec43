"""Sweep compaction-sort key layouts on the steady-state wavefront and
measure production-kernel time for each: how much does packet quality
depend on the key?"""
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.render import integrator as integ

BIG = 3.4e38

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load("/root/repo/.scratch/steady_state.npz")
org0 = jnp.asarray(d["org"])
dirn0 = jnp.asarray(d["dirn"])
alive0 = jnp.asarray(d["alive"])

kern = jax.jit(lambda o, dd, tm: pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))


def bench_with_perm(perm, label, reps=5):
    org, dirn, alive = org0[perm], dirn0[perm], alive0[perm]
    tmax = jnp.where(alive, BIG, 0.0).astype(jnp.float32)
    org, dirn, tmax = map(jax.block_until_ready, (org, dirn, tmax))
    jax.block_until_ready(kern(org, dirn, tmax))
    t0 = time.time()
    for _ in range(reps):
        o = kern(org, dirn, tmax)
    jax.block_until_ready(o)
    print(f"{label:36s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)


u32 = jnp.uint32


def key_custom(org, dirn, alive, dir_bits, morton_hi_bits):
    """dead | morton_hi | octant | dir | morton_lo — morton_hi_bits of
    spatial locality OUTRANK direction."""
    dead = jnp.where(alive, u32(0), u32(1))
    octant = ((dirn[:, 0] < 0).astype(u32) * u32(4)
              + (dirn[:, 1] < 0).astype(u32) * u32(2)
              + (dirn[:, 2] < 0).astype(u32))
    lo = jnp.min(org, axis=0)
    span = jnp.maximum(jnp.max(org, axis=0) - lo, 1e-20)
    q = jnp.clip((org - lo) / span * 255.0, 0.0, 255.0).astype(u32)
    def expand(v):
        v = (v | (v << u32(16))) & u32(0x030000FF)
        v = (v | (v << u32(8))) & u32(0x0300F00F)
        v = (v | (v << u32(4))) & u32(0x030C30C3)
        v = (v | (v << u32(2))) & u32(0x09249249)
        return v
    morton = ((expand(q[:, 0]) << u32(2)) | (expand(q[:, 1]) << u32(1))
              | expand(q[:, 2]))  # 24 bits
    a = jnp.abs(dirn)
    a = a / jnp.maximum(jnp.sum(a, axis=1, keepdims=True), 1e-20)
    top = u32((1 << dir_bits) - 1) if dir_bits else u32(0)
    qx = jnp.clip((a[:, 0] * top).astype(u32), 0, top)
    qy = jnp.clip((a[:, 1] * top).astype(u32), 0, top)

    key = dead << u32(31)
    pos = 31
    mh = morton >> u32(24 - morton_hi_bits) if morton_hi_bits else u32(0)
    pos -= morton_hi_bits
    key |= mh << u32(pos)
    pos -= 3
    key |= octant << u32(pos)
    pos -= 2 * dir_bits
    if dir_bits:
        key |= (qx << u32(pos + dir_bits)) | (qy << u32(pos))
    ml_bits = max(0, pos)
    ml = (morton << u32(morton_hi_bits)) & u32(0xFFFFFF)  # low bits
    key |= ml >> u32(24 - ml_bits) if ml_bits < 24 else ml
    return key


# current production key
perm = jnp.argsort(integ._compaction_key(org0, dirn0, alive0))
bench_with_perm(perm, "production key (oct|dir3|morton)")

for dir_bits, mhi in [(3, 0), (5, 0), (0, 0), (3, 6), (3, 12), (6, 6)]:
    k = key_custom(org0, dirn0, alive0, dir_bits, mhi)
    bench_with_perm(jnp.argsort(k), f"dir{dir_bits} mortonhi{mhi}")

# unsorted baseline
bench_with_perm(jnp.arange(org0.shape[0]), "unsorted")
