"""topk dtype scaling, in context (fed by the real cull)."""
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
tmax = jnp.where(alive, jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38), 0.0).astype(jnp.float32)
org = org.astype(jnp.float32); dirn = dirn.astype(jnp.float32)
cl_lo, cl_hi = pack.wf_cl_lo, pack.wf_cl_hi
nc = cl_lo.shape[0]; R = 8; n_pk = N // R

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps):
        o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"RESULT {label:46s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return o

def make(keydtype):
    @jax.jit
    def cull_topk(org, dirn, tmax):
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
            if keydtype == "i32":
                return jnp.where(jnp.isfinite(tent),
                                 jnp.int32(0x7FFFFFFF) - lax.bitcast_convert_type(tent, jnp.int32),
                                 jnp.int32(-1))
            if keydtype == "bf16":
                return jnp.where(jnp.isfinite(tent), -tent, -jnp.inf).astype(jnp.bfloat16)
            if keydtype == "u8":
                return jnp.any(hit.reshape(-1, R, nc), axis=1).astype(jnp.uint8)
            if keydtype == "u16":
                # quantized near-key: 1 + (65534 - clamped log-ish)
                q = jnp.clip(tent * 64.0, 0, 65000.0).astype(jnp.uint16)
                return jnp.where(jnp.isfinite(tent), jnp.uint16(65001) - q, jnp.uint16(0))
        key = lax.map(_cull, (org.reshape(nb, cull_block, 3),
                              dirn.reshape(nb, cull_block, 3),
                              tmax.reshape(nb, cull_block))).reshape(n_pk, nc)
        v, i = lax.top_k(key, 128)
        return i[0, 0] + v.reshape(-1)[0].astype(jnp.int32) if keydtype != "bf16" else i[0, 0]
    return cull_topk

for kd in ("i32", "bf16", "u16", "u8"):
    try:
        bench(make(kd), f"cull+topk key={kd}", org, dirn, tmax)
    except Exception as e:
        print("FAIL", kd, repr(e)[:200], flush=True)
