"""Split-phase timing of the wavefront pipeline on the steady-state
wavefront: cull / extraction / MT measured separately."""
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
tmax = jnp.where(alive, jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38), 0.0).astype(jnp.float32)
org, dirn, tmax = map(jax.block_until_ready, (org, dirn, tmax))

cl_lo, cl_hi, tri_geom = pack.wf_cl_lo, pack.wf_cl_hi, pack.tri_geom
nc = cl_lo.shape[0]
n_pk = N // pwf.R

@jax.jit
def cull(org, dirn, t_max):
    cull_block = 8192
    nb = N // cull_block
    def _cull(args):
        o_b, d_b, tm_b = args
        inv = 1.0 / d_b
        near = jnp.full((o_b.shape[0], nc), pwf.T_MIN_STATIC, jnp.float32)
        far = jnp.broadcast_to(tm_b[:, None], (o_b.shape[0], nc))
        for ax in range(3):
            t0 = (cl_lo[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            t1 = (cl_hi[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = near <= far
        return hit.reshape(cull_block // pwf.R, pwf.R, nc).any(1)
    return lax.map(_cull, (org.reshape(nb, cull_block, 3),
                           dirn.reshape(nb, cull_block, 3),
                           t_max.reshape(nb, cull_block))).reshape(n_pk, nc)

@jax.jit
def extract(pk_hit):
    cap = n_pk * pwf.PAIRS_PER_PACKET_CAP
    cap = -(-cap // pwf.CHUNK) * pwf.CHUNK
    flat = pk_hit.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    pk = jnp.where(idx >= 0, idx // nc, -1).astype(jnp.int32)
    cl = jnp.where(idx >= 0, idx % nc, 0).astype(jnp.int32)
    return pk, cl, jnp.sum(flat, dtype=jnp.int32)

def bench(f, label, reps=5):
    o = jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
    t0 = time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"{label:34s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return o

ph = bench(lambda: cull(org, dirn, tmax), "cull (per-axis layout)")
pk, cl, n_pairs = bench(lambda: extract(ph), "extract (nonzero 325M)")
print("pairs:", int(n_pairs), flush=True)

full = jax.jit(lambda o, dd, tm: pwf.intersect_triangles_wavefront(pack, o, dd, 1e-3, tm))
bench(lambda: full(org, dirn, tmax), "full pipeline (per-axis cull)")
