"""MT-kernel ablations on the real candidate lists."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_wavefront as W

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load("/root/repo/.scratch/steady_r5.npz")
org = jnp.asarray(d["org"], jnp.float32)
dirn = jnp.asarray(d["dirn"], jnp.float32)
tmax = jnp.asarray(d["tmax"], jnp.float32)
N = org.shape[0]
n_pk = N // W.R

# real candidate lists: run the pipeline stages up to the MT input
sn_lo, sn_hi = pack.wf_sn_lo, pack.wf_sn_hi
sn_start, sn_bounds = pack.wf_sn_start, pack.wf_sn_bounds
S = sn_lo.shape[0]
k1 = min(W.K1, -(-S // 8) * 8)

@jax.jit
def upto_compact(org, dirn, t_max):
    n = org.shape[0]
    cull_block = 65536
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
    if S < k1:
        key1 = jnp.pad(key1, ((0, 0), (0, k1 - S)), constant_values=-1)
    top1, sn_slot = lax.top_k(key1, k1)
    n1 = jnp.minimum(jnp.sum(key1 >= 0, axis=1, dtype=jnp.int32), k1)
    sn_slot = jnp.where(top1 >= 0, sn_slot, 0)
    from jax.experimental import pallas as pl2
    from jax.experimental.pallas import tpu as pltpu2
    rays_g = [W._to_groups(org[:, 0]), W._to_groups(org[:, 1]), W._to_groups(org[:, 2]),
              W._to_groups(dirn[:, 0]), W._to_groups(dirn[:, 1]), W._to_groups(dirn[:, 2])]
    tmax_g = W._to_groups(jnp.minimum(t_max, W.BIG))
    G = rays_g[0].shape[0]
    tri = (lax.broadcasted_iota(jnp.int32, (W.SN, W.SN), 0)
           <= lax.broadcasted_iota(jnp.int32, (W.SN, W.SN), 1)).astype(jnp.float32)
    keys, blk_cnt = pl2.pallas_call(
        W._make_cull_kernel(k1, W.KC),
        grid=(n_pk // W.PPG,),
        in_specs=[pl2.BlockSpec((W.PPG, k1), lambda i: (i, 0), memory_space=pltpu2.SMEM),
                  pl2.BlockSpec((W.PPG, 1), lambda i: (i, 0), memory_space=pltpu2.SMEM),
                  pl2.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu2.SMEM)]
                 + [pl2.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu2.VMEM)] * 7
                 + [pl2.BlockSpec(sn_bounds.shape, lambda i: (0, 0, 0), memory_space=pltpu2.VMEM),
                    pl2.BlockSpec((W.SN, W.SN), lambda i: (0, 0), memory_space=pltpu2.VMEM)],
        out_specs=[pl2.BlockSpec((W.PPG, k1, W.KC), lambda i: (i, 0, 0), memory_space=pltpu2.VMEM),
                   pl2.BlockSpec((W.PPG, k1, 1), lambda i: (i, 0, 0), memory_space=pltpu2.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pk, k1, W.KC), jnp.int32),
                   jax.ShapeDtypeStruct((n_pk, k1, 1), jnp.int32)],
        scratch_shapes=[pltpu2.VMEM((8, W.SN), jnp.int32)] * 2,
        compiler_params=pltpu2.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
    )(sn_slot, n1[:, None], sn_start[:, None], *rays_g, tmax_g, sn_bounds, tri)
    kk = min(W.PAIRS_PER_PACKET_CAP, k1 * W.KC)
    flat = keys.reshape(n_pk, k1 * W.KC)
    top, real = W._compact_candidates(flat, n1 * W.KC, kk, False)
    cl = jnp.where(top >= 0, top, 0)
    cnt = jnp.minimum(real, kk)
    return cl, cnt

k = min(W.PAIRS_PER_PACKET_CAP, k1 * W.KC)
cl, cnt = jax.block_until_ready(upto_compact(org, dirn, tmax))
cnt_np = np.asarray(cnt)
print("k =", k, "mean cnt:", cnt_np.mean(), "p99:", np.percentile(cnt_np, 99),
      flush=True)

# pair completeness: fraction of candidates whose partner cluster (id^1)
# is also in the same packet's list
cl_np = np.asarray(cl)
valid = np.arange(k)[None, :] < cnt_np[:, None]
pairs_tot = 0; pairs_both = 0
for j in range(0, n_pk, 47):
    ids = set(cl_np[j][valid[j]])
    pairs_tot += len(ids)
    pairs_both += sum(1 for c in ids if (c ^ 1) in ids)
print(f"pair completeness: {pairs_both/max(pairs_tot,1):.3f}", flush=True)

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

mtj = jax.jit(lambda *a: W._mt_call(*a, k, False))
bench(lambda: mtj(cl, cnt, pack.tri_geom, org, dirn, tmax), "MT baseline")

# ablation: no dynamic tri load (use cluster 0 always)
def make_mt_ablate(k, mode):
    GRP, BANKS, R, CLUSTER, PPG = W.GRP, W.BANKS, W.R, W.CLUSTER, W.PPG
    BIG, T_MIN_STATIC = W.BIG, W.T_MIN_STATIC
    def kernel(cl_ref, cnt_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               tri_ref, t_out, i_out, best_t, best_i):
        i0 = pl.program_id(0) * PPG
        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            d_x = W._lane_extract(dx[g], c)
            d_y = W._lane_extract(dy[g], c)
            d_z = W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            best_t[...] = jnp.broadcast_to(tm[None], (BANKS, R, 1))
            best_i[...] = jnp.full((BANKS, R, 1), -1, jnp.int32)
            n_j = cnt_ref[j, 0]
            for grp in range(-(-k // GRP)):
                @pl.when(grp * GRP < n_j)
                def _(grp=grp):
                    for s in range(min(GRP, k - grp * GRP)):
                        slot = grp * GRP + s
                        if mode == "noload":
                            cl_ = 0
                        else:
                            cl_ = cl_ref[j, slot]
                        live = slot < n_j
                        blk = tri_ref[cl_]
                        if mode == "noslab":
                            ok = (blk[0:1, :] > -1e30) & live
                            tt = jnp.where(ok, blk[0:1, :], BIG)
                        else:
                            v0x = blk[0:1, :]; v0y = blk[1:2, :]; v0z = blk[2:3, :]
                            e1x = blk[3:4, :]; e1y = blk[4:5, :]; e1z = blk[5:6, :]
                            e2x = blk[6:7, :]; e2y = blk[7:8, :]; e2z = blk[8:9, :]
                            back = blk[9:10, :]
                            px = d_y * e2z - d_z * e2y
                            py = d_z * e2x - d_x * e2z
                            pz = d_x * e2y - d_y * e2x
                            det = e1x * px + e1y * py + e1z * pz
                            dd = jnp.where(back > 0.5, jnp.abs(det), det)
                            ok = (dd > 1e-12) & live
                            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                            bx = o_x - v0x; by = o_y - v0y; bz = o_z - v0z
                            u = (bx * px + by * py + bz * pz) * inv_det
                            qx = by * e1z - bz * e1y
                            qy = bz * e1x - bx * e1z
                            qz = bx * e1y - by * e1x
                            w = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                            ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0)
                            ok &= (u + w <= 1.0)
                            tt = jnp.where(ok, t, BIG)
                        bank = s % BANKS
                        bt = best_t[bank]
                        tt = jnp.where(tt < bt, tt, BIG)
                        new_t = jnp.min(tt, axis=1, keepdims=True)
                        new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                        better = new_t < bt
                        best_i[bank] = jnp.where(better, cl_ * CLUSTER + new_i, best_i[bank])
                        best_t[bank] = jnp.where(better, new_t, bt)
            ts = [best_t[b] for b in range(BANKS)]
            is_ = [best_i[b] for b in range(BANKS)]
            while len(ts) > 1:
                nt, ni = [], []
                for m in range(0, len(ts), 2):
                    take = ts[m + 1] < ts[m]
                    nt.append(jnp.where(take, ts[m + 1], ts[m]))
                    ni.append(jnp.where(take, is_[m + 1], is_[m]))
                ts, is_ = nt, ni
            onehot = W._lane_iota() == c
            t_out[g] = jnp.where(onehot, ts[0], t_out[g])
            i_out[g] = jnp.where(onehot, is_[0], i_out[g])
            return 0
        lax.fori_loop(0, PPG, packet_body, 0)
    return kernel

def mt_call_ablate(mode):
    tri_geom = pack.tri_geom[:, :10, :]
    rays_g = [W._to_groups(org[:, 0]), W._to_groups(org[:, 1]), W._to_groups(org[:, 2]),
              W._to_groups(dirn[:, 0]), W._to_groups(dirn[:, 1]), W._to_groups(dirn[:, 2])]
    tmax_g = W._to_groups(jnp.minimum(tmax, W.BIG))
    G = rays_g[0].shape[0]
    cl_spec = pl.BlockSpec((W.PPG, k), lambda i: (i, 0), memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((W.PPG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    fullc = pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(tri_geom.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        make_mt_ablate(k, mode),
        grid=(n_pk // W.PPG,),
        in_specs=[cl_spec, cnt_spec] + [fullc] * 7 + [tri_spec],
        out_specs=[fullc, fullc],
        out_shape=[jax.ShapeDtypeStruct((G, W.R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((G, W.R, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((W.BANKS, W.R, 1), jnp.float32),
                        pltpu.VMEM((W.BANKS, W.R, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
    )
    jf = jax.jit(lambda *a: fn(*a))
    args = (cl, cnt[:, None], *rays_g, tmax_g, tri_geom)
    return jf, args

for mode in ("base2", "noload", "noslab"):
    jf, args = mt_call_ablate(mode if mode != "base2" else "base")
    bench(lambda jf=jf, args=args: jf(*args), f"MT ablate {mode}")

# ---- structural sweep: pair body x BANKS x GRP ----
def make_mt_v2(k, grp_sz, banks, pair):
    R, CLUSTER, PPG = W.R, W.CLUSTER, W.PPG
    BIG, T_MIN_STATIC = W.BIG, W.T_MIN_STATIC
    def kernel(cl_ref, cnt_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               tri_ref, t_out, i_out, best_t, best_i):
        i0 = pl.program_id(0) * PPG
        def do_packet(j):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            d_x = W._lane_extract(dx[g], c)
            d_y = W._lane_extract(dy[g], c)
            d_z = W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            best_t[...] = jnp.broadcast_to(tm[None], (banks, R, 1))
            best_i[...] = jnp.full((banks, R, 1), -1, jnp.int32)
            n_j = cnt_ref[j, 0]
            for grp in range(-(-k // grp_sz)):
                @pl.when(grp * grp_sz < n_j)
                def _(grp=grp):
                    for s in range(min(grp_sz, k - grp * grp_sz)):
                        slot = grp * grp_sz + s
                        cl_ = cl_ref[j, slot]
                        live = slot < n_j
                        blk = tri_ref[cl_]
                        v0x = blk[0:1, :]; v0y = blk[1:2, :]; v0z = blk[2:3, :]
                        e1x = blk[3:4, :]; e1y = blk[4:5, :]; e1z = blk[5:6, :]
                        e2x = blk[6:7, :]; e2y = blk[7:8, :]; e2z = blk[8:9, :]
                        back = blk[9:10, :]
                        px = d_y * e2z - d_z * e2y
                        py = d_z * e2x - d_x * e2z
                        pz = d_x * e2y - d_y * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        dd = jnp.where(back > 0.5, jnp.abs(det), det)
                        ok = (dd > 1e-12) & live
                        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                        bx = o_x - v0x; by = o_y - v0y; bz = o_z - v0z
                        u = (bx * px + by * py + bz * pz) * inv_det
                        qx = by * e1z - bz * e1y
                        qy = bz * e1x - bx * e1z
                        qz = bx * e1y - by * e1x
                        w = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0)
                        ok &= (u + w <= 1.0)
                        bank = s % banks
                        bt = best_t[bank]
                        ok &= (t > T_MIN_STATIC) & (t < bt)
                        tt = jnp.where(ok, t, BIG)
                        new_t = jnp.min(tt, axis=1, keepdims=True)
                        new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                        better = new_t < bt
                        best_i[bank] = jnp.where(better, cl_ * CLUSTER + new_i, best_i[bank])
                        best_t[bank] = jnp.where(better, new_t, bt)
            ts = [best_t[b] for b in range(banks)]
            is_ = [best_i[b] for b in range(banks)]
            while len(ts) > 1:
                nt, ni = [], []
                for m in range(0, len(ts), 2):
                    take = ts[m + 1] < ts[m]
                    nt.append(jnp.where(take, ts[m + 1], ts[m]))
                    ni.append(jnp.where(take, is_[m + 1], is_[m]))
                ts, is_ = nt, ni
            onehot = W._lane_iota() == c
            t_out[g] = jnp.where(onehot, ts[0], t_out[g])
            i_out[g] = jnp.where(onehot, is_[0], i_out[g])
        if pair:
            def pair_body(jj, _):
                do_packet(2 * jj)
                do_packet(2 * jj + 1)
                return 0
            lax.fori_loop(0, PPG // 2, pair_body, 0)
        else:
            def body(j, _):
                do_packet(j)
                return 0
            lax.fori_loop(0, PPG, body, 0)
    return kernel

def mt_v2_call(grp_sz, banks, pair):
    tri_geom = pack.tri_geom[:, :10, :]
    rays_g = [W._to_groups(org[:, 0]), W._to_groups(org[:, 1]), W._to_groups(org[:, 2]),
              W._to_groups(dirn[:, 0]), W._to_groups(dirn[:, 1]), W._to_groups(dirn[:, 2])]
    tmax_g = W._to_groups(jnp.minimum(tmax, W.BIG))
    G = rays_g[0].shape[0]
    fn = pl.pallas_call(
        make_mt_v2(k, grp_sz, banks, pair),
        grid=(n_pk // W.PPG,),
        in_specs=[pl.BlockSpec((W.PPG, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
                  pl.BlockSpec((W.PPG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)] * 7
                 + [pl.BlockSpec(tri_geom.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((G, W.R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((G, W.R, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((banks, W.R, 1), jnp.float32),
                        pltpu.VMEM((banks, W.R, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
    )
    jf = jax.jit(lambda *a: fn(*a))
    args = (cl, cnt[:, None], *rays_g, tmax_g, tri_geom)
    return jf, args

ref_t, ref_i = mtj(cl, cnt, pack.tri_geom, org, dirn, tmax)
ref_i = np.asarray(ref_i)
for grp_sz, banks, pair in ((16, 8, True), (32, 8, True), (16, 4, True),
                            (32, 4, True), (16, 16, True)):
    jf, args = mt_v2_call(grp_sz, banks, pair)
    bench(lambda: jf(*args), f"MT grp={grp_sz} banks={banks} pair={pair}")
    t2, i2 = jf(*args)
    same = (np.asarray(W._from_groups(i2))[:N] == ref_i).mean()
    if same < 1.0:
        print(f"  !! id mismatch {same}", flush=True)
