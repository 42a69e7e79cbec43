"""In-context cost of: cull alone; cull+topk at varying row granularity;
MT kernel alone (precomputed slots); supernode-level topk."""
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
tmax = jnp.where(alive, jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38), 0.0).astype(jnp.float32)
org = org.astype(jnp.float32); dirn = dirn.astype(jnp.float32)

cl_lo, cl_hi, tri_geom = pack.wf_cl_lo, pack.wf_cl_hi, pack.tri_geom
nc = cl_lo.shape[0]

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps):
        o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"RESULT {label:46s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return o

def make_cull(rp):  # rp = rays per packet for the reduce
    n_pk = N // rp
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
            tent = jnp.min(jnp.where(hit, near, jnp.inf).reshape(-1, rp, nc), axis=1)
            return jnp.where(jnp.isfinite(tent),
                             jnp.int32(0x7FFFFFFF) - lax.bitcast_convert_type(tent, jnp.int32),
                             jnp.int32(-1))
        return lax.map(_cull, (org.reshape(nb, cull_block, 3),
                               dirn.reshape(nb, cull_block, 3),
                               tmax.reshape(nb, cull_block))).reshape(n_pk, nc)
    return cull

for rp in (8, 32, 64):
    c = make_cull(rp)
    bench(c, f"cull rp={rp} (key out, {N//rp}x{nc})", org, dirn, tmax)
    for k in (128, 256) if rp > 8 else (128,):
        ck = jax.jit(lambda o, d, t, c=c, k=k: lax.top_k(c(o, d, t), k)[1][0, 0])
        # note: c is jitted; calling inside jit inlines it
        bench(ck, f"cull+topk rp={rp} k={k}", org, dirn, tmax)

# supernode-level: reduce keys (n_pk8, nc) -> (n_pk8, S) by 128-chunk max, then topk 24
c8 = make_cull(8)
S = -(-nc // 128)
@jax.jit
def sn_topk(org, dirn, tmax):
    key = c8(org, dirn, tmax)
    pad = S * 128 - nc
    key = jnp.pad(key, ((0, 0), (0, pad)), constant_values=-1)
    sn_key = jnp.max(key.reshape(-1, S, 128), axis=2)
    return lax.top_k(sn_key, 24)[1][0, 0]
bench(sn_topk, f"cull8 + snmax + topk24 ({N//8}x{S})", org, dirn, tmax)

# MT kernel alone: precomputed slots from the current pipeline
t2, slot2, n_pairs, n_ovf = pwf._pipeline(cl_lo, cl_hi, tri_geom, org, dirn,
                                          jnp.minimum(tmax, pwf.BIG), interpret=False)
print("pairs", int(n_pairs), flush=True)
