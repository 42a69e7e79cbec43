"""r5 baseline profile: full pool step + stage breakdown on the real
steady-state cornell_dragon wavefront (2^18 lanes).  Run SOLO."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import pool as poolmod
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import pallas_wavefront as W
from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=8, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
pack, static = sc.compile_scene(scene)
n_pixels = camera.image_width * camera.image_height
total = n_pixels * 8
N = 1 << 18

step = poolmod.make_step(pack, static, camera, total, 8, 0)
state = poolmod.init_state(N, n_pixels)
for i in range(30):
    state = step(pack, state)
jax.block_until_ready(state.accum)
print("steady: active", int(jnp.sum(state.active)),
      "issued", int(jnp.sum(state.next_flat)), flush=True)

# deep-copy the steady state: the donated full-step bench below deletes
# the original buffers
snap = jax.tree_util.tree_map(jnp.copy, state)
org, dirn, alive = snap.org, snap.dirn, snap.active
pixel, sample, bounce = snap.pixel, snap.sample, snap.bounce
state_arrs = snap

def bench(f, label, reps=8):
    o = f(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.time()-t0)/reps)
    print(f"RESULT {label:40s} {best*1e3:8.1f} ms", flush=True)

# --- full pool step (chained; state is donated) ---
st = state
def full_step():
    global st
    st = step(pack, st)
    return st.accum
bench(full_step, "FULL pool step", reps=8)

# --- wavefront traversal, pool order ---
t_min = jnp.full((N,), 1e-3, jnp.float32)
inf = jnp.full((N,), jnp.inf, jnp.float32)
t_sph, _ = isect.intersect_spheres(pack, org, dirn, t_min, inf)
t_pln, _ = isect.intersect_planes(pack, org, dirn, t_min, inf)
tmax = jnp.where(alive, jnp.minimum(jnp.minimum(t_sph, t_pln), 3.4e38), 0.0).astype(jnp.float32)
orgf, dirnf = org.astype(jnp.float32), dirn.astype(jnp.float32)

wf = jax.jit(lambda o, d, tm: W.intersect_triangles_wavefront(pack, o, d, 1e-3, tm))
bench(lambda: wf(orgf, dirnf, tmax), "wavefront kernel")

# --- stage truncation of _pipeline2 (current signatures) ---
sn_lo, sn_hi = pack.wf_sn_lo, pack.wf_sn_hi
sn_start, sn_bounds = pack.wf_sn_start, pack.wf_sn_bounds
tri_geom = pack.tri_geom
S = sn_lo.shape[0]
k1 = min(W.K1, -(-S // 8) * 8)
print("S =", S, "k1 =", k1, "nc =", pack.wf_cl_lo.shape[0], flush=True)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def stages(upto):
    @jax.jit
    def f(org, dirn, t_max):
        n = org.shape[0]; n_pk = n // W.R
        cull_block = 65536 if n % 65536 == 0 else 8192
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
        if upto == "l1cull":
            return key1
        kk1 = k1
        if S < kk1:
            key1 = jnp.pad(key1, ((0, 0), (0, kk1 - S)), constant_values=-1)
        top1, sn_slot = lax.top_k(key1, kk1)
        l1_cnt = jnp.sum(key1 >= 0, axis=1, dtype=jnp.int32)
        n1 = jnp.minimum(l1_cnt, kk1)
        sn_slot = jnp.where(top1 >= 0, sn_slot, 0)
        if upto == "l1topk":
            return sn_slot, n1
        rays_g = [W._to_groups(org[:, 0]), W._to_groups(org[:, 1]), W._to_groups(org[:, 2]),
                  W._to_groups(dirn[:, 0]), W._to_groups(dirn[:, 1]), W._to_groups(dirn[:, 2])]
        tmax_g = W._to_groups(jnp.minimum(t_max, W.BIG))
        G = rays_g[0].shape[0]
        sn_spec = pl.BlockSpec((W.PPG, kk1), lambda i: (i, 0), memory_space=pltpu.SMEM)
        n1_spec = pl.BlockSpec((W.PPG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
        snst_spec = pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        fullc = pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        bounds_spec = pl.BlockSpec(sn_bounds.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        keys, blk_cnt = pl.pallas_call(
            W._make_cull_kernel(kk1, W.KC), grid=(n_pk // W.PPG,),
            in_specs=[sn_spec, n1_spec, snst_spec] + [fullc] * 7 + [bounds_spec],
            out_specs=[pl.BlockSpec((W.PPG, kk1, W.KC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((W.PPG, kk1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n_pk, kk1, W.KC), jnp.int32),
                       jax.ShapeDtypeStruct((n_pk, kk1, 1), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((8, W.SN), jnp.int32),
                            pltpu.VMEM((8, W.SN), jnp.int32),
                            pltpu.VMEM((8, W.SN), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
        )(sn_slot, n1[:, None], sn_start[:, None], *rays_g, tmax_g, sn_bounds)
        if upto == "kernelA":
            return keys, blk_cnt
        k = min(W.PAIRS_PER_PACKET_CAP, kk1 * W.KC)
        flat = keys.reshape(n_pk, kk1 * W.KC)
        top, real = W._compact_candidates(flat, n1 * W.KC, k, False)
        cl = jnp.where(top >= 0, top, 0)
        cnt = jnp.minimum(real, k)
        if upto == "compact":
            return cl, cnt
        t, slot = W._mt_call(cl, cnt, tri_geom, org, dirn, t_max, k, False)
        return t, slot
    return f

for st_name in ("l1cull", "l1topk", "kernelA", "compact", "full"):
    fn = stages(st_name)
    bench(lambda fn=fn: fn(orgf, dirnf, tmax), f"pipeline upto {st_name}")

# --- other step pieces ---
ctx = vrng.Ctx(pixel=pixel, sample=sample, bounce=bounce, seed=jnp.uint32(0))
sv = jax.jit(lambda o, d, a: integ.shade_vertex(pack, static, o, d, ctx, 0.25, a))
bench(lambda: sv(org, dirn, alive), "shade_vertex total")

rad = jnp.ones((N, 3), jnp.float32)
acc0 = jnp.zeros((n_pixels, 3), jnp.float32)
retired = np.asarray(alive) & (np.random.default_rng(0).random(N) < 0.2)
retired = jnp.asarray(retired)
scat = jax.jit(lambda a, p, r, m: a.at[p].add(jnp.where(m[:, None], r, 0.0), mode="drop"))
bench(lambda: scat(acc0, pixel, rad, retired), "scatter-add (all lanes, masked)")

# sorted-scatter variant: sort retirements by pixel, drop the rest
def scat_sorted(a, p, r, m):
    key = jnp.where(m, p, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key)
    ps = key[perm]
    rs = jnp.where((ps != jnp.uint32(0xFFFFFFFF))[:, None], r[perm], 0.0)
    return a.at[ps].add(rs, mode="drop", indices_are_sorted=True)
scs = jax.jit(scat_sorted)
bench(lambda: scs(acc0, pixel, rad, retired), "scatter-add (pixel-sorted)")

srt = jax.jit(lambda o, d, a: jnp.argsort(integ._compaction_key(o, d, a)))
bench(lambda: srt(org, dirn, alive), "compaction key+argsort")

perm = srt(org, dirn, alive)
ap = jax.jit(lambda p, *arrs: tuple(a[p] for a in arrs))
bench(lambda: ap(perm, state_arrs.org, state_arrs.dirn, state_arrs.throughput,
                 state_arrs.radiance, state_arrs.pixel, state_arrs.sample,
                 state_arrs.bounce, state_arrs.active),
      "apply perm to 8 state arrays")

sp_ = jax.jit(lambda o, d: isect.intersect_spheres(pack, o, d, t_min, inf))
bench(lambda: sp_(org, dirn), "intersect_spheres")
pl_ = jax.jit(lambda o, d: isect.intersect_planes(pack, o, d, t_min, inf))
bench(lambda: pl_(org, dirn), "intersect_planes")

np.savez("/root/repo/.scratch/steady_r5.npz",
         org=np.asarray(org), dirn=np.asarray(dirn),
         alive=np.asarray(alive), pixel=np.asarray(pixel),
         sample=np.asarray(sample), bounce=np.asarray(bounce),
         tmax=np.asarray(tmax))
print("saved steady_r5.npz", flush=True)
