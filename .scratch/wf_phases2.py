"""Phase costs of the wavefront pipeline: cull, top_k extraction, MT kernel."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
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
org = org.astype(jnp.float32); dirn = dirn.astype(jnp.float32)

cl_lo, cl_hi, tri_geom = pack.wf_cl_lo, pack.wf_cl_hi, pack.tri_geom
nc = cl_lo.shape[0]
R = pwf.R
n_pk = N // R
print("nc =", nc, "n_pk =", n_pk, flush=True)

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps): o = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"{label:38s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return o

@jax.jit
def cull(org, dirn, tmax):
    cull_block = 8192
    nb = N // cull_block
    def _cull(args):
        o_b, d_b, tm_b = args
        inv = 1.0 / d_b
        near = jnp.full((o_b.shape[0], nc), 1e-3, jnp.float32)
        far = jnp.broadcast_to(tm_b[:, None], (o_b.shape[0], nc))
        for ax in range(3):
            t0 = (cl_lo[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            t1 = (cl_hi[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = near <= far
        tent = jnp.min(jnp.where(hit, near, jnp.inf).reshape(-1, R, nc), axis=1)
        key = jnp.where(jnp.isfinite(tent),
                        jnp.int32(0x7FFFFFFF) - lax.bitcast_convert_type(tent, jnp.int32),
                        jnp.int32(-1))
        return key
    return lax.map(_cull, (org.reshape(nb, cull_block, 3),
                           dirn.reshape(nb, cull_block, 3),
                           tmax.reshape(nb, cull_block))).reshape(n_pk, nc)

pk_key = bench(cull, "cull (+key)", org, dirn, tmax)

topk = jax.jit(lambda k_: lax.top_k(k_, 64))
(top, top_cl) = bench(topk, "top_k 64", pk_key)

# full pipeline for reference
full = jax.jit(lambda o, dd, tm: pwf._pipeline(cl_lo, cl_hi, tri_geom, o, dd,
                                               jnp.minimum(tm, pwf.BIG), interpret=False))
bench(full, "full pipeline", org, dirn, tmax)
