"""Is the in-context top_k slowness a layout effect? Compare top_k on the
cull's actual output vs a host-roundtripped copy; also time k=128 vs 64
on both, and check top_k correctness vs numpy."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
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
tmax = jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38).astype(jnp.float32)
tmax = jnp.where(alive, tmax, 0.0)
org = org.astype(jnp.float32); dirn = dirn.astype(jnp.float32)

cl_lo, cl_hi = pack.wf_cl_lo, pack.wf_cl_hi
nc = cl_lo.shape[0]; R = 8; n_pk = N // R

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
        return jnp.where(jnp.isfinite(tent),
                         jnp.int32(0x7FFFFFFF) - lax.bitcast_convert_type(tent, jnp.int32),
                         jnp.int32(-1))
    return lax.map(_cull, (org.reshape(nb, cull_block, 3),
                           dirn.reshape(nb, cull_block, 3),
                           tmax.reshape(nb, cull_block))).reshape(n_pk, nc)

pk_key = jax.block_until_ready(cull(org, dirn, tmax))
print("pk_key", pk_key.shape, pk_key.dtype, flush=True)
fresh = jax.device_put(np.asarray(pk_key))

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps):
        o = f(*args); jax.block_until_ready(o)
    print(f"RESULT {label:40s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return o

f128 = jax.jit(lambda x: jnp.sum(lax.top_k(x, 128)[1] % 97))
f64 = jax.jit(lambda x: jnp.sum(lax.top_k(x, 64)[1] % 97))
bench(f128, "top_k k=128 on cull output", pk_key)
bench(f128, "top_k k=128 on fresh copy", fresh)
bench(f64, "top_k k=64 on cull output", pk_key)
bench(f64, "top_k k=64 on fresh copy", fresh)

# correctness of the k=128 fast path vs numpy on a slice
v, i = jax.jit(lambda x: lax.top_k(x, 128))(fresh)
v = np.asarray(v[:64]); i = np.asarray(i[:64]); kk = np.asarray(fresh[:64])
ref = np.sort(kk, axis=1)[:, ::-1][:, :128]
print("topk values match numpy:", bool((v == ref).all()), flush=True)
