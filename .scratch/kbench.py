"""Kernel benchmark driver: production BVH8 kernel vs v5 interleave,
optionally with CLUSTER=256 scene pack, on the saved steady-state
wavefront.  Usage: python .scratch/kbench.py [cluster]"""
import importlib
import sys
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu.ops import pallas_intersect as ppi
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8

CLUSTER = int(sys.argv[1]) if len(sys.argv) > 1 else 128
if CLUSTER != 128:
    ppi.CLUSTER = CLUSTER
    pb8.CLUSTER = CLUSTER

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import integrator as integ

t0 = time.time()
scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
print(f"build {time.time()-t0:.1f}s  clusters={pack.tri_geom.shape[0]} "
      f"n8={pack.bvh8_aabb.shape[0]} cluster={CLUSTER}", flush=True)

d = np.load("/root/repo/.scratch/steady_state.npz")
org = jnp.asarray(d["org"]) ; dirn = jnp.asarray(d["dirn"])
alive = jnp.asarray(d["alive"])
perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
org, dirn, alive = org[perm], dirn[perm], alive[perm]
tmax = jnp.where(alive, np.float32(3.4e38), 0.0).astype(jnp.float32)
org, dirn, tmax = map(jax.block_until_ready, (org, dirn, tmax))
N = org.shape[0]


def bench(f, label, reps=5):
    o = jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label:34s} {dt:8.1f} ms   {N/dt*1e3/1e6:6.2f} Mray/s",
          flush=True)
    return o


prod = jax.jit(lambda o, dd, tm: pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))
t_ref, i_ref = bench(lambda: prod(org, dirn, tmax), f"production TILE=128 C={CLUSTER}")
