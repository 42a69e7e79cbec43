"""Diagnose wavefront-vs-bvh8 mismatch: t agreement vs id agreement,
overflow correlation, and cap=128 behavior."""
import sys; sys.path.insert(0, "/root/repo")
import time
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
org = jnp.asarray(d["org"]); dirn = jnp.asarray(d["dirn"]); alive = jnp.asarray(d["alive"])
perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
org, dirn, alive = org[perm], dirn[perm], alive[perm]
N = org.shape[0]
t_min = jnp.full((N,), 1e-3, jnp.float32)
inf = jnp.full((N,), jnp.inf, jnp.float32)
t_sph, _ = isect.intersect_spheres(pack, org, dirn, t_min, inf)
t_pln, _ = isect.intersect_planes(pack, org, dirn, t_min, inf)
tmax = jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38)
tmax = jnp.where(alive, tmax, 0.0).astype(jnp.float32)

t1, i1 = pb8.intersect_triangles_bvh8(pack, org, dirn, 1e-3, tmax)
t1, i1 = np.asarray(t1), np.asarray(i1)

def run(cap):
    pwf.PAIRS_PER_PACKET_CAP = cap
    pwf._pipeline.clear_cache()
    f = jax.jit(lambda o, dd, tm: pwf._pipeline(pack.wf_cl_lo, pack.wf_cl_hi,
        pack.tri_geom, o, dd, jnp.minimum(tm, pwf.BIG), interpret=False))
    out = f(org, dirn, tmax); jax.block_until_ready(out[0])
    t0 = time.time()
    for _ in range(5): out = f(org, dirn, tmax)
    jax.block_until_ready(out[0]); dt = (time.time()-t0)/5*1e3
    t2, i2, n_pairs, n_ovf = map(np.asarray, out)
    t2, i2 = t2[:N], i2[:N]
    al = np.asarray(alive)
    id_match = ((i2 == i1) | ~al).mean()
    tm_ = np.asarray(tmax)
    # t agreement: compare hit t (or tmax on miss)
    tt2 = np.where(i2 >= 0, t2, tm_)
    tt1 = np.where(i1 >= 0, t1, tm_)
    t_match = ((np.abs(tt2 - tt1) <= 1e-4 + 1e-4*np.abs(tt1)) | ~al).mean()
    print(f"cap={cap}: {dt:.1f} ms  id_match={id_match:.6f} t_match={t_match:.6f} "
          f"pairs={int(n_pairs)} ovf={int(n_ovf)}", flush=True)
    return i2, t2

i2, t2 = run(64)
run(96)
run(128)
