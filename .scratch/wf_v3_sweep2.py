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
tmax = jnp.where(alive, jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38), 0.0).astype(jnp.float32)
org = org.astype(jnp.float32); dirn = dirn.astype(jnp.float32)
al = np.asarray(alive)

t1, i1 = pb8.intersect_triangles_bvh8(pack, org, dirn, 1e-3, tmax)
t1, i1 = np.asarray(t1), np.asarray(i1)

def run(k1, kc, cap):
    pwf.K1, pwf.KC, pwf.PAIRS_PER_PACKET_CAP = k1, kc, cap
    pwf._pipeline2.clear_cache()
    f = jax.jit(lambda o, dd, tm: pwf._pipeline2(
        pack.wf_sn_lo, pack.wf_sn_hi, pack.wf_sn_start, pack.wf_sn_bounds,
        pack.tri_geom, o, dd, jnp.minimum(tm, pwf.BIG), interpret=False))
    out = f(org, dirn, tmax); jax.block_until_ready(out[0])
    t0 = time.time()
    for _ in range(5): out = f(org, dirn, tmax)
    jax.block_until_ready(out[0]); dt = (time.time()-t0)/5*1e3
    t2, i2, n_pairs, n_ovf = map(np.asarray, out)
    t2, i2 = t2[:N], i2[:N]
    id_match = ((i2 == i1) | ~al).mean()
    print(f"K1={k1} KC={kc} cap={cap}: {dt:6.1f} ms  id={id_match:.5f} "
          f"pairs={int(n_pairs)} ovf={int(n_ovf)}", flush=True)

run(40, 16, 96)
run(40, 16, 128)
run(40, 32, 128)
run(40, 32, 96)
