"""Benchmark the wavefront cull->MT pipeline vs the (t_min-clamped) BVH8
packet kernel on the real cornell_dragon steady-state wavefront."""
import time
import sys; sys.path.insert(0, "/root/repo")

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.ops import pallas_wavefront as pwf
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.render import integrator as integ

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load("/root/repo/.scratch/steady_state.npz")
org = jnp.asarray(d["org"])
dirn = jnp.asarray(d["dirn"])
alive = jnp.asarray(d["alive"])
perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
org, dirn, alive = org[perm], dirn[perm], alive[perm]
N = org.shape[0]

# production-realistic t_max: bounded by nearest sphere/plane (walls)
t_min = jnp.full((N,), 1e-3, jnp.float32)
inf = jnp.full((N,), jnp.inf, jnp.float32)
t_sph, _ = isect.intersect_spheres(pack, org, dirn, t_min, inf)
t_pln, _ = isect.intersect_planes(pack, org, dirn, t_min, inf)
tmax = jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38)
tmax = jnp.where(alive, tmax, 0.0).astype(jnp.float32)
tmax_inf = jnp.where(alive, 3.4e38, 0.0).astype(jnp.float32)
org, dirn, tmax, tmax_inf = map(jax.block_until_ready,
                                (org, dirn, tmax, tmax_inf))


def bench(f, label, reps=5):
    o = jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
    t0 = time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label:42s} {dt:8.1f} ms   {N/dt*1e3/1e6:6.2f} Mray/s", flush=True)
    return o


b8 = jax.jit(lambda o, dd, tm: pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))
t1, i1 = bench(lambda: b8(org, dirn, tmax_inf), "bvh8+clamp, tmax=inf")
t1b, i1b = bench(lambda: b8(org, dirn, tmax), "bvh8+clamp, wall-bounded tmax")

wf = jax.jit(lambda o, dd, tm: pwf.intersect_triangles_wavefront(pack, o, dd, 1e-3, tm))
t2, i2 = bench(lambda: wf(org, dirn, tmax), "wavefront pipeline, wall-bounded")

match = float(jnp.mean((i2 == i1b) | ~alive))
print(f"wavefront vs bvh8 id match: {match:.6f}", flush=True)

# pair-count observability
_, _, n_pairs, n_ovf = pwf._pipeline(
    pack.wf_cl_lo, pack.wf_cl_hi, pack.tri_geom,
    org, dirn, tmax, interpret=False)
print(f"pairs: {int(n_pairs)} ({int(n_pairs)/(N//8):.1f}/packet, "
      f"cap {pwf.PAIRS_PER_PACKET_CAP}, overflow {int(n_ovf)})", flush=True)
