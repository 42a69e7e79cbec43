"""Phase costs of pipeline v3 by progressive truncation."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools
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
import rust_raytracer_tpu.ops.pallas_wavefront as W

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
tmax = jnp.minimum(tmax, W.BIG)

def bench(f, label, reps=5):
    o = f(org, dirn, tmax); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps):
        o = f(org, dirn, tmax); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"RESULT {label:36s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)

cl_lo, cl_hi, tri_geom = pack.wf_cl_lo, pack.wf_cl_hi, pack.tri_geom

# monkeypatch _pipeline2 piecewise by copying its body? simpler: time
# sub-jits replicating each stage using module internals
import types

def stages(upto):
    @jax.jit
    def f(org, dirn, t_max):
        n = org.shape[0]; n_pk = n // W.R; nc = cl_lo.shape[0]
        S = -(-nc // W.SN); k1 = min(W.K1, -(-S // 8) * 8)
        pad = S * W.SN - nc
        lo_p = jnp.concatenate([cl_lo, jnp.full((pad, 3), W.BIG, cl_lo.dtype)]).reshape(S, W.SN, 3)
        hi_p = jnp.concatenate([cl_hi, jnp.full((pad, 3), W.BIG, cl_hi.dtype)]).reshape(S, W.SN, 3)
        sn_lo = jnp.min(lo_p, axis=1)
        sn_hi = jnp.where(jnp.max(hi_p, axis=1) >= W.BIG,
                          jnp.max(cl_hi, axis=0)[None, :], jnp.max(hi_p, axis=1))
        bounds = jnp.concatenate([jnp.transpose(lo_p, (0, 2, 1)),
                                  jnp.transpose(hi_p, (0, 2, 1))], axis=1)
        cull_block = 8192
        nb = n // cull_block
        def _cull1(args):
            o_b, d_b, tm_b = args
            inv = 1.0 / d_b
            near = jnp.full((o_b.shape[0], S), W.T_MIN_STATIC, jnp.float32)
            far = jnp.broadcast_to(tm_b[:, None], (o_b.shape[0], S))
            for ax in range(3):
                t0 = (sn_lo[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
                t1 = (sn_hi[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
                near = jnp.maximum(near, jnp.minimum(t0, t1))
                far = jnp.minimum(far, jnp.maximum(t0, t1))
            hit = near <= far
            tent = jnp.min(jnp.where(hit, near, jnp.inf).reshape(-1, W.R, S), axis=1)
            return jnp.where(jnp.isfinite(tent),
                             jnp.int32(0x7FFFFFFF) - lax.bitcast_convert_type(tent, jnp.int32),
                             jnp.int32(-1))
        key1 = lax.map(_cull1, (org.reshape(nb, cull_block, 3),
                                dirn.reshape(nb, cull_block, 3),
                                t_max.reshape(nb, cull_block))).reshape(n_pk, S)
        if upto == "l1":
            return key1
        if S < k1:
            key1 = jnp.pad(key1, ((0, 0), (0, k1 - S)), constant_values=-1)
        top1, sn_slot = lax.top_k(key1, k1)
        l1_cnt = jnp.sum(key1 >= 0, axis=1, dtype=jnp.int32)
        n1 = jnp.minimum(l1_cnt, k1)
        sn_slot = jnp.where(top1 >= 0, sn_slot, 0)
        if upto == "l1topk":
            return sn_slot, n1
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rays_g = [W._to_groups(org[:, 0]), W._to_groups(org[:, 1]), W._to_groups(org[:, 2]),
                  W._to_groups(dirn[:, 0]), W._to_groups(dirn[:, 1]), W._to_groups(dirn[:, 2])]
        tmax_g = W._to_groups(jnp.minimum(t_max, W.BIG))
        G = rays_g[0].shape[0]
        sn_spec = pl.BlockSpec((W.PPG, k1), lambda i: (i, 0), memory_space=pltpu.SMEM)
        n1_spec = pl.BlockSpec((W.PPG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
        fullc = pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        bounds_spec = pl.BlockSpec(bounds.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        keys, blk_cnt = pl.pallas_call(
            W._make_cull_kernel(k1, W.KC), grid=(n_pk // W.PPG,),
            in_specs=[sn_spec, n1_spec] + [fullc] * 7 + [bounds_spec],
            out_specs=[pl.BlockSpec((W.PPG, k1, W.KC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((W.PPG, k1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n_pk, k1, W.KC), jnp.int32),
                       jax.ShapeDtypeStruct((n_pk, k1, 1), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((8, W.SN), jnp.int32), pltpu.VMEM((8, W.SN), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
        )(sn_slot, n1[:, None], *rays_g, tmax_g, bounds)
        if upto == "kernelA":
            return keys
        k = min(W.PAIRS_PER_PACKET_CAP, k1 * W.KC)
        flat = keys.reshape(n_pk, k1 * W.KC)
        top, _ = lax.top_k(flat, k)
        cl = jnp.where(top >= 0, top & ((1 << W._ID_BITS) - 1), 0)
        real = jnp.sum(flat >= 0, axis=1, dtype=jnp.int32)
        cnt = jnp.minimum(real, k)
        if upto == "l2topk":
            return cl, cnt
        t, slot = W._mt_call(cl, cnt, tri_geom, org, dirn, t_max, k, False)
        return t, slot
    return f

for st in ("l1", "l1topk", "kernelA", "l2topk", "full"):
    bench(stages(st), f"upto {st}")
