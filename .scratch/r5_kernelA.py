"""Kernel A variants, timed in-context on the steady-state wavefront.

Baseline r5: kernel A stage = 40 ms (1.31M slot visits, ~30 ns/visit).
Hypothesis: the per-slot scalar chain (SMEM id read -> dynamic VMEM
block load -> vector use) serializes; variants try to give the scalar
unit room to run ahead.
"""
import sys; sys.path.insert(0, "/root/repo")
import time, functools
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

sn_lo, sn_hi = pack.wf_sn_lo, pack.wf_sn_hi
sn_start, sn_bounds = pack.wf_sn_start, pack.wf_sn_bounds
S = sn_lo.shape[0]
k1 = min(W.K1, -(-S // 8) * 8)
KC = W.KC

def bench(f, label, reps=8):
    o = f(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.time()-t0)/reps)
    print(f"RESULT {label:44s} {best*1e3:8.1f} ms", flush=True)

# ---- shared L1 stage (compute once, feed kernels real slot lists) ----
@jax.jit
def l1(org, dirn, t_max):
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
    kk1 = k1
    if S < kk1:
        key1 = jnp.pad(key1, ((0, 0), (0, kk1 - S)), constant_values=-1)
    top1, sn_slot = lax.top_k(key1, kk1)
    n1 = jnp.minimum(jnp.sum(key1 >= 0, axis=1, dtype=jnp.int32), kk1)
    return jnp.where(top1 >= 0, sn_slot, 0), n1

sn_slot, n1 = jax.block_until_ready(l1(org, dirn, tmax))
print("mean n1:", float(jnp.mean(n1)), "p99:",
      float(jnp.percentile(n1.astype(jnp.float32), 99)), flush=True)

rays_g = [W._to_groups(org[:, 0]), W._to_groups(org[:, 1]), W._to_groups(org[:, 2]),
          W._to_groups(dirn[:, 0]), W._to_groups(dirn[:, 1]), W._to_groups(dirn[:, 2])]
tmax_g = W._to_groups(jnp.minimum(tmax, W.BIG))
G = rays_g[0].shape[0]

def call_kernel(kern_factory, label, ppg=W.PPG, scratch_rows=3):
    sn_spec = pl.BlockSpec((ppg, k1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    n1_spec = pl.BlockSpec((ppg, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    snst_spec = pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    fullc = pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bounds_spec = pl.BlockSpec(sn_bounds.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern_factory,
        grid=(n_pk // ppg,),
        in_specs=[sn_spec, n1_spec, snst_spec] + [fullc] * 7 + [bounds_spec],
        out_specs=[pl.BlockSpec((ppg, k1, KC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((ppg, k1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pk, k1, KC), jnp.int32),
                   jax.ShapeDtypeStruct((n_pk, k1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((8, W.SN), jnp.int32)] * scratch_rows,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
    )
    jf = jax.jit(lambda *a: fn(*a))
    args = (sn_slot, n1[:, None], sn_start[:, None], *rays_g, tmax_g, sn_bounds)
    bench(lambda: jf(*args), label)
    return jf(*args)

# ---- baseline: current kernel ----
ref_keys, ref_cnt = call_kernel(W._make_cull_kernel(k1, KC), "A baseline (current)")

# ---- variant PPG=16 / PPG=4 (same kernel body; PPG is module-global) ----
# skipped: PPG is baked into the factory; emulate by a local factory below.

def make_cull_v2(k1, kc, ppg, preload=False, interleave=False):
    """Variant factory: optional block-preload pass; optional 2-batch
    slab interleave."""
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            def do_slot(s8, slot):
                sn = sn_ref[j, slot]
                live = slot < n1v
                blk = bounds_ref[sn]
                sn_base = snst_ref[sn, 0]
                tx0 = (blk[0:1, :] - o_x) * inv_x
                tx1 = (blk[3:4, :] - o_x) * inv_x
                ty0 = (blk[1:2, :] - o_y) * inv_y
                ty1 = (blk[4:5, :] - o_y) * inv_y
                tz0 = (blk[2:3, :] - o_z) * inv_z
                tz1 = (blk[5:6, :] - o_z) * inv_z
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), tm))
                anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

            def flush(batch):
                valid, packed, cnt8 = W._lane_compact(mrows[...], qrows[...])
                lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                gid = snrows[...] + packed
                key = jnp.where((valid > 0) & (lane < kc), gid, -1)
                key_out[j, batch*8:batch*8+8, :] = key[:, :kc]
                cnt_out[j, batch*8:batch*8+8, :] = cnt8

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        do_slot(s8, batch * 8 + s8)
                    flush(batch)
            return 0

        lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

# sanity: v2 with same structure matches baseline output
keys2, cnt2 = call_kernel(make_cull_v2(k1, KC, W.PPG), "A v2 (refactored ==)")

def masked_eq(keys_a, cnt_a):
    # compare only valid batches (skipped batches hold garbage)
    nb = np.asarray(n1)
    ka, kb = np.asarray(ref_keys), np.asarray(keys_a)
    ok = True
    for j in range(0, n_pk, 997):
        b_valid = -(-int(nb[j]) // 8) * 8
        ok &= np.array_equal(ka[j, :b_valid], kb[j, :b_valid])
    return ok
print("v2 matches:", masked_eq(keys2, cnt2), flush=True)

# ---- ablations ----
def make_ablate(k1, kc, ppg, mode):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            if mode == "noextract":
                o_x = ox[g][:, 0:1]; o_y = oy[g][:, 0:1]; o_z = oz[g][:, 0:1]
                inv_x = dx[g][:, 0:1]; inv_y = dy[g][:, 0:1]; inv_z = dz[g][:, 0:1]
                tm = tmax_ref[g][:, 0:1]
            else:
                o_x = W._lane_extract(ox[g], c)
                o_y = W._lane_extract(oy[g], c)
                o_z = W._lane_extract(oz[g], c)
                inv_x = 1.0 / W._lane_extract(dx[g], c)
                inv_y = 1.0 / W._lane_extract(dy[g], c)
                inv_z = 1.0 / W._lane_extract(dz[g], c)
                tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            def do_slot(s8, slot):
                if mode == "noload":
                    blk = bounds_ref[0]
                    sn_base = snst_ref[0, 0]
                else:
                    sn = sn_ref[j, slot]
                    blk = bounds_ref[sn]
                    sn_base = snst_ref[sn, 0]
                live = slot < n1v
                if mode == "noslab":
                    anyhit = (blk[0:1, :] > -1e30)[0:1] & live
                else:
                    tx0 = (blk[0:1, :] - o_x) * inv_x
                    tx1 = (blk[3:4, :] - o_x) * inv_x
                    ty0 = (blk[1:2, :] - o_y) * inv_y
                    ty1 = (blk[4:5, :] - o_y) * inv_y
                    tz0 = (blk[2:3, :] - o_z) * inv_z
                    tz1 = (blk[5:6, :] - o_z) * inv_z
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), tm))
                    anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

            def flush(batch):
                if mode == "nocompact":
                    key_out[j, batch*8:batch*8+8, :] = mrows[...][:, :kc]
                    cnt_out[j, batch*8:batch*8+8, :] = mrows[...][:, 0:1]
                else:
                    valid, packed, cnt8 = W._lane_compact(mrows[...], qrows[...])
                    lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                    gid = snrows[...] + packed
                    key = jnp.where((valid > 0) & (lane < kc), gid, -1)
                    key_out[j, batch*8:batch*8+8, :] = key[:, :kc]
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        do_slot(s8, batch * 8 + s8)
                    flush(batch)
            return 0

        if mode == "unroll":
            lax.fori_loop(0, ppg, packet_body, 0, unroll=ppg)
        else:
            lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

for mode in ("noload", "noslab", "nocompact", "noextract", "unroll"):
    call_kernel(make_ablate(k1, KC, W.PPG, mode), f"A ablate {mode}")

# ---- packed-word butterfly compaction: 2 rolls/stage instead of 6 ----
def _lane_compact_packed(valid_i, vals):
    n_lane = vals.shape[1]
    dbits = (n_lane - 1).bit_length()
    lane = lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    incl = W._lane_cumsum(valid_i)
    cnt = incl[:, n_lane - 1:n_lane]
    rank = incl - valid_i
    dest = jnp.where(valid_i > 0, rank, lane)
    packed = (vals << (dbits + 1)) | (dest << 1) | valid_i
    mask = n_lane - 1
    b = 1
    while b < n_lane:
        hi = (lane & b) != 0
        p = jnp.where(hi, jnp.roll(packed, b, axis=1),
                      jnp.roll(packed, -b, axis=1))
        dest_f = lax.shift_right_logical(packed, 1) & mask
        valid_f = packed & 1
        cross = (valid_f > 0) & (((lane ^ dest_f) & b) != 0)
        p_dest = lax.shift_right_logical(p, 1) & mask
        p_valid = p & 1
        incoming = (p_valid > 0) & ((((lane ^ b) ^ p_dest) & b) != 0)
        packed = jnp.where(incoming, p,
                           jnp.where(cross, packed & ~1, packed))
        b *= 2
    return packed & 1, lax.shift_right_logical(packed, dbits + 1), cnt

def make_cull_packed(k1, kc, ppg):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1v
                        blk = bounds_ref[sn]
                        sn_base = snst_ref[sn, 0]
                        tx0 = (blk[0:1, :] - o_x) * inv_x
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm))
                        anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                        mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                        qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                        snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

                    valid, packed, cnt8 = _lane_compact_packed(mrows[...], qrows[...])
                    lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                    gid = snrows[...] + packed
                    key = jnp.where((valid > 0) & (lane < kc), gid, -1)
                    key_out[j, batch*8:batch*8+8, :] = key[:, :kc]
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8
            return 0

        lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

keysP, cntP = call_kernel(make_cull_packed(k1, KC, W.PPG), "A packed-compact")
print("packed matches:", masked_eq(keysP, cntP), flush=True)

# ---- compaction-internals ablations ----
def make_cull_ablate2(k1, kc, ppg, mode):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1v
                        blk = bounds_ref[sn]
                        sn_base = snst_ref[sn, 0]
                        tx0 = (blk[0:1, :] - o_x) * inv_x
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm))
                        anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                        mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                        qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                        snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

                    m = mrows[...]
                    q = qrows[...]
                    if mode == "cumsum_only":
                        incl = W._lane_cumsum(m)
                        key = incl + q
                        cnt8 = incl[:, 127:128]
                    elif mode == "route_only":
                        # butterfly data movement with precomputed trivial
                        # dest (= lane): no crossings, same op count
                        lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                        vals = q
                        valid = m
                        dest = lane
                        b = 1
                        while b < 128:
                            hi = (lane & b) != 0
                            pv = jnp.where(hi, jnp.roll(vals, b, axis=1), jnp.roll(vals, -b, axis=1))
                            pd = jnp.where(hi, jnp.roll(dest, b, axis=1), jnp.roll(dest, -b, axis=1))
                            cross = ((valid > 0) & (((lane ^ dest) & b) != 0)).astype(jnp.int32)
                            pc = jnp.where(hi, jnp.roll(cross, b, axis=1), jnp.roll(cross, -b, axis=1))
                            inc = pc > 0
                            vals = jnp.where(inc, pv, vals)
                            dest = jnp.where(inc, pd, dest)
                            valid = jnp.where(inc, 1, jnp.where(cross > 0, 0, valid))
                            b *= 2
                        key = vals
                        cnt8 = m[:, 0:1]
                    elif mode == "pltpu_roll":
                        lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                        incl = m
                        d = 1
                        while d < 128:
                            rolled = pltpu.roll(incl, 128 - d, 1)
                            incl = incl + jnp.where(lane >= d, rolled, 0)
                            d *= 2
                        cnt8 = incl[:, 127:128]
                        rank = incl - m
                        dest = jnp.where(m > 0, rank, lane)
                        vals = q
                        valid = m
                        b = 1
                        while b < 128:
                            hi = (lane & b) != 0
                            def pr(x, b=b, hi=hi):
                                return jnp.where(hi, pltpu.roll(x, 128 - b, 1),
                                                 pltpu.roll(x, b, 1))
                            cross = ((valid > 0) & (((lane ^ dest) & b) != 0)).astype(jnp.int32)
                            pc = pr(cross)
                            inc = pc > 0
                            vals = jnp.where(inc, pr(vals), vals)
                            dest = jnp.where(inc, pr(dest), dest)
                            valid = jnp.where(inc, 1, jnp.where(cross > 0, 0, valid))
                            b *= 2
                        gid = snrows[...] + vals
                        key = jnp.where((valid > 0) & (lane < kc), gid, -1)
                    key_out[j, batch*8:batch*8+8, :] = key[:, :kc]
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8
            return 0

        lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

for mode in ("cumsum_only", "route_only", "pltpu_roll"):
    k_, c_ = call_kernel(make_cull_ablate2(k1, KC, W.PPG, mode), f"A compact-{mode}")
    if mode == "pltpu_roll":
        print("pltpu_roll matches:", masked_eq(k_, c_), flush=True)

# ---- matmul cumsum + packed radix-4 routing ----
TRI = jnp.asarray(np.tril(np.ones((128, 128), np.float32)).T)  # [l,k]=1 iff l<=k

def _compact_mm_r4(valid_i, vals, tri_ref):
    """Compaction via MXU cumsum + radix-4 digit-fixing (packed word).
    valid_i/vals (8,128) i32; tri_ref (128,128) f32 upper-tri."""
    n_lane = 128
    lane = lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    incl = jax.lax.dot_general(
        valid_i.astype(jnp.float32), tri_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt = incl[:, n_lane - 1:n_lane]
    rank = incl - valid_i
    dest = jnp.where(valid_i > 0, rank, lane)
    packed = (vals << 9) | (dest << 1) | valid_i
    for b, radix in ((1, 4), (4, 4), (16, 4), (64, 2)):
        dest_f = lax.shift_right_logical(packed, 1) & 127
        cur_d = (lane // b) % radix  # compile-time iota pattern
        dst_d = (dest_f // b) % radix
        delta = dst_d - cur_d
        valid_f = packed & 1
        moving = (valid_f > 0) & (delta != 0)
        out = jnp.where(moving, packed & ~1, packed)
        for dlt in range(1, radix):
            for sgn, sh in ((1, dlt * b), (-1, (n_lane - dlt * b))):
                p = pltpu.roll(packed, sh if sgn == 1 else n_lane - sh, 1) \
                    if False else jnp.roll(packed, sgn * dlt * b, axis=1)
                p_dest = lax.shift_right_logical(p, 1) & 127
                p_lane = lane - sgn * dlt * b  # source lane (pre-roll)
                p_cur = (p_lane // b) % radix
                p_dst = (p_dest // b) % radix
                take = ((p & 1) > 0) & ((p_dst - p_cur) == sgn * dlt)
                out = jnp.where(take, p, out)
        packed = out
    return packed & 1, lax.shift_right_logical(packed, 9), cnt

def make_cull_mm(k1, kc, ppg):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, tri_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1v
                        blk = bounds_ref[sn]
                        sn_base = snst_ref[sn, 0]
                        tx0 = (blk[0:1, :] - o_x) * inv_x
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm))
                        anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                        mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                        qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                        snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

                    valid, packed, cnt8 = _compact_mm_r4(mrows[...], qrows[...], tri_ref)
                    lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                    gid = snrows[...] + packed
                    key = jnp.where((valid > 0) & (lane < kc), gid, -1)
                    key_out[j, batch*8:batch*8+8, :] = key[:, :kc]
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8
            return 0

        lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

def call_kernel_mm(kern_factory, label, ppg=W.PPG):
    sn_spec = pl.BlockSpec((ppg, k1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    n1_spec = pl.BlockSpec((ppg, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    snst_spec = pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    fullc = pl.BlockSpec((G, W.R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bounds_spec = pl.BlockSpec(sn_bounds.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern_factory,
        grid=(n_pk // ppg,),
        in_specs=[sn_spec, n1_spec, snst_spec] + [fullc] * 7 + [bounds_spec, tri_spec],
        out_specs=[pl.BlockSpec((ppg, k1, KC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((ppg, k1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pk, k1, KC), jnp.int32),
                   jax.ShapeDtypeStruct((n_pk, k1, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((8, W.SN), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
    )
    jf = jax.jit(lambda *a: fn(*a))
    args = (sn_slot, n1[:, None], sn_start[:, None], *rays_g, tmax_g, sn_bounds, TRI)
    bench(lambda: jf(*args), label)
    return jf(*args)

kM, cM = call_kernel_mm(make_cull_mm(k1, KC, W.PPG), "A matmul-cumsum + radix4")
print("mm+r4 matches:", masked_eq(kM, cM), flush=True)

# ---- isolate: matmul cumsum + radix-2 packed routing ----
def _compact_mm_r2(valid_i, vals, tri_ref):
    n_lane = 128
    lane = lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    incl = jax.lax.dot_general(
        valid_i.astype(jnp.float32), tri_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt = incl[:, n_lane - 1:n_lane]
    rank = incl - valid_i
    dest = jnp.where(valid_i > 0, rank, lane)
    packed = (vals << 9) | (dest << 1) | valid_i
    b = 1
    while b < n_lane:
        hi = (lane & b) != 0
        p = jnp.where(hi, jnp.roll(packed, b, axis=1), jnp.roll(packed, -b, axis=1))
        dest_f = lax.shift_right_logical(packed, 1) & 127
        cross = ((packed & 1) > 0) & (((lane ^ dest_f) & b) != 0)
        p_dest = lax.shift_right_logical(p, 1) & 127
        incoming = ((p & 1) > 0) & ((((lane ^ b) ^ p_dest) & b) != 0)
        packed = jnp.where(incoming, p, jnp.where(cross, packed & ~1, packed))
        b *= 2
    return packed & 1, lax.shift_right_logical(packed, 9), cnt

# ---- rank-select: no routing; KC independent masked reductions ----
def _compact_select(valid_i, vals, tri_ref, kc):
    n_lane = 128
    lane = lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    incl = jax.lax.dot_general(
        valid_i.astype(jnp.float32), tri_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt = incl[:, n_lane - 1:n_lane]
    sel = jnp.where(valid_i > 0, incl, 0)  # 1-based rank where valid
    cols = []
    for j in range(kc):
        idj = jnp.sum(jnp.where(sel == j + 1, vals, 0), axis=1, keepdims=True)
        okj = jnp.sum((sel == j + 1).astype(jnp.int32), axis=1, keepdims=True)
        cols.append(jnp.where(okj > 0, idj, -(1 << 20)))
    out = jnp.concatenate(cols, axis=1)  # (8, kc)
    return out, cnt

def make_cull_mm2(k1, kc, ppg, mode):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, tri_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1v
                        blk = bounds_ref[sn]
                        sn_base = snst_ref[sn, 0]
                        tx0 = (blk[0:1, :] - o_x) * inv_x
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm))
                        anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                        mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                        qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                        snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

                    if mode == "r2":
                        valid, packed, cnt8 = _compact_mm_r2(mrows[...], qrows[...], tri_ref)
                        lane = lax.broadcasted_iota(jnp.int32, (8, W.SN), 1)
                        gid = snrows[...] + packed
                        key = jnp.where((valid > 0) & (lane < kc), gid, -1)
                        key_out[j, batch*8:batch*8+8, :] = key[:, :kc]
                    else:
                        out, cnt8 = _compact_select(mrows[...], qrows[...], tri_ref, kc)
                        base = snrows[...][:, 0:1]
                        key = jnp.where(out > -(1 << 19), base + out, -1)
                        key_out[j, batch*8:batch*8+8, :] = key
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8
            return 0

        lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

kR2, cR2 = call_kernel_mm(make_cull_mm2(k1, KC, W.PPG, "r2"), "A matmul + radix2-packed")
print("mm+r2 matches:", masked_eq(kR2, cR2), flush=True)
kSel, cSel = call_kernel_mm(make_cull_mm2(k1, KC, W.PPG, "select"), "A matmul + rank-select")
print("mm+select matches:", masked_eq(kSel, cSel), flush=True)

# ---- rank-select with 4-way packed reductions ----
def _compact_select4(valid_i, vals, tri_ref, kc):
    n_lane = 128
    incl = jax.lax.dot_general(
        valid_i.astype(jnp.float32), tri_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt = incl[:, n_lane - 1:n_lane]
    sel = jnp.where(valid_i > 0, incl, 0)
    vv = vals + 1  # 1..128: nonzero marks presence; 8 bits
    cols = []
    for j0 in range(0, kc, 4):
        acc = jnp.where(sel == j0 + 1, vv, 0)
        acc |= jnp.where(sel == j0 + 2, vv, 0) << 8
        acc |= jnp.where(sel == j0 + 3, vv, 0) << 16
        acc |= jnp.where(sel == j0 + 4, vv, 0) << 24
        s = jnp.sum(acc, axis=1, keepdims=True)
        for piece in range(4):
            f = lax.shift_right_logical(s, 8 * piece) & 255
            cols.append(f - 1)  # -1 when absent (field 0)
    out = jnp.concatenate(cols, axis=1)
    return out, cnt

def make_cull_sel4(k1, kc, ppg):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, tri_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def packet_body(j, _):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1v
                        blk = bounds_ref[sn]
                        sn_base = snst_ref[sn, 0]
                        tx0 = (blk[0:1, :] - o_x) * inv_x
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm))
                        anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                        mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                        qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                        snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

                    out, cnt8 = _compact_select4(mrows[...], qrows[...], tri_ref, kc)
                    base = snrows[...][:, 0:1]
                    key = jnp.where(out >= 0, base + out, -1)
                    key_out[j, batch*8:batch*8+8, :] = key
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8
            return 0

        lax.fori_loop(0, ppg, packet_body, 0)
    return kernel

kS4, cS4 = call_kernel_mm(make_cull_sel4(k1, KC, W.PPG), "A matmul + rank-select-pack4")
print("sel4 matches:", masked_eq(kS4, cS4), flush=True)

# ---- sel4 with two packets per fori iteration ----
def make_cull_sel4_pair(k1, kc, ppg):
    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, tri_ref, key_out, cnt_out, mrows, snrows, qrows):
        i0 = pl.program_id(0) * ppg

        def do_packet(j):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = W._lane_extract(ox[g], c)
            o_y = W._lane_extract(oy[g], c)
            o_z = W._lane_extract(oz[g], c)
            inv_x = 1.0 / W._lane_extract(dx[g], c)
            inv_y = 1.0 / W._lane_extract(dy[g], c)
            inv_z = 1.0 / W._lane_extract(dz[g], c)
            tm = W._lane_extract(tmax_ref[g], c)
            n1v = n1_ref[j, 0]

            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1v)
                def _(batch=batch):
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1v
                        blk = bounds_ref[sn]
                        sn_base = snst_ref[sn, 0]
                        tx0 = (blk[0:1, :] - o_x) * inv_x
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), W.T_MIN_STATIC))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm))
                        anyhit = jnp.any(near <= far, axis=0, keepdims=True) & live
                        mrows[s8:s8+1, :] = anyhit.astype(jnp.int32)
                        qrows[s8:s8+1, :] = lax.broadcasted_iota(jnp.int32, (1, W.SN), 1)
                        snrows[s8:s8+1, :] = jnp.full((1, W.SN), sn_base, jnp.int32)

                    out, cnt8 = _compact_select4(mrows[...], qrows[...], tri_ref, kc)
                    base = snrows[...][:, 0:1]
                    key = jnp.where(out >= 0, base + out, -1)
                    key_out[j, batch*8:batch*8+8, :] = key
                    cnt_out[j, batch*8:batch*8+8, :] = cnt8

        def pair_body(jj, _):
            do_packet(2 * jj)
            do_packet(2 * jj + 1)
            return 0

        lax.fori_loop(0, ppg // 2, pair_body, 0)
    return kernel

kP2, cP2 = call_kernel_mm(make_cull_sel4_pair(k1, KC, W.PPG), "A sel4 two-packet body")
print("sel4-pair matches:", masked_eq(kP2, cP2), flush=True)
