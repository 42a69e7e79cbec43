"""BVH8 kernel v6 "octo": 8-ray packets (sublanes) x 128-tri clusters
(lanes), P-way slot interleave with persistent packet refill.

Why: at TILE=128 the packet-union waste saturates — steady-state packets
visit 567 leaf clusters (9.3M MT pairs each), a ~370ms/step vector-work
floor no amount of latency hiding fixes.  8-ray packets cut the union
~10-40x while every vector op stays a native (8,128) tile:

  * MT: ray columns (8,1) x tri rows (1,128) -> (8,128), one native tile
    per leaf visit.
  * AABB: rays (8,1) x children-on-lanes (1,128) via a lane-layout copy
    of the BVH8 AABBs -> (8,128); child hit bits = sum over both axes of
    mask * lanebit.  One vector->scalar sync per internal visit.
  * P slots advance independent packets each while-iteration; a slot
    whose packet dies refills from a shared SMEM counter, so no
    slot-group barrier waste.

Ray layout: [g, r, c] = ray r (sublane) of packet p = g*128 + c (lane).
Per-packet access is a dynamic-lane (8,1) column slice.
"""
import functools
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
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.render import integrator as integ

R = 8          # rays per packet (sublanes)
CLUSTER = 128  # triangles per leaf (lanes)
STACK = 64     # mask-stack entries (node<<8 | childmask)
DET_EPS = 1e-12
BIG = 3.4e38
T_MIN_STATIC = 1e-3


def make_kernel(n_slots):
    def _kernel(child_s, aabbL, ox, oy, oz, dx, dy, dz, tmax_ref,
                tri_ref, t_out, i_out):
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lanebits = jnp.where(lane < 8, jnp.left_shift(jnp.int32(1), lane),
                             jnp.int32(0))
        n_packets = ox.shape[0] * 128

        def run(stack_ref, sp_ref, pid_ref, ctr_ref,
                best_t, best_i, o_col, d_col, inv_col):
            # per-slot state:
            #   sp_ref[s]   stack depth (0 = idle, needs refill)
            #   pid_ref[s]  current packet id (-1 = none)
            #   best_t/best_i[s]  (8,1) columns
            #   o_col/d_col/inv_col[s]  (3,8,1)->(24,1)? stored (s,3*8,1)
            ctr_ref[0] = jnp.int32(0)
            for s in range(n_slots):
                sp_ref[s] = jnp.int32(0)
                pid_ref[s] = jnp.int32(-1)

            def cond(it):
                busy = ctr_ref[0] < n_packets
                for s in range(n_slots):
                    busy |= sp_ref[s] > 0
                return busy

            def body(it):
                for s in range(n_slots):
                    sp = sp_ref[s]
                    pid = pid_ref[s]

                    # --- retire + refill an idle slot ---
                    need = (sp == 0) & (ctr_ref[0] < n_packets)

                    @pl.when(sp == 0)
                    def _(s=s, pid=pid):
                        # flush previous packet's result
                        @pl.when(pid >= 0)
                        def _():
                            g = lax.div(pid, 128)
                            c = lax.rem(pid, 128)
                            t_out[g, :, pl.ds(c, 1)] = best_t[s]
                            i_out[g, :, pl.ds(c, 1)] = best_i[s]
                        pid_ref[s] = jnp.int32(-1)

                    @pl.when(need)
                    def _(s=s):
                        p = ctr_ref[0]
                        ctr_ref[0] = p + 1
                        pid_ref[s] = p
                        g = lax.div(p, 128)
                        c = lax.rem(p, 128)
                        o_col[s, 0] = ox[g, :, pl.ds(c, 1)]
                        o_col[s, 1] = oy[g, :, pl.ds(c, 1)]
                        o_col[s, 2] = oz[g, :, pl.ds(c, 1)]
                        dxc = dx[g, :, pl.ds(c, 1)]
                        dyc = dy[g, :, pl.ds(c, 1)]
                        dzc = dz[g, :, pl.ds(c, 1)]
                        d_col[s, 0] = dxc
                        d_col[s, 1] = dyc
                        d_col[s, 2] = dzc
                        inv_col[s, 0] = 1.0 / dxc
                        inv_col[s, 1] = 1.0 / dyc
                        inv_col[s, 2] = 1.0 / dzc
                        best_t[s] = jnp.minimum(tmax_ref[g, :, pl.ds(c, 1)], BIG)
                        best_i[s] = jnp.full((R, 1), -1, jnp.int32)
                        # root: node 0, all-children mask; AABB phase
                        # will prune
                        stack_ref[s, 0] = (0 << 8) | 255
                        sp_ref[s] = jnp.int32(1)

                    # --- advance one child-visit if busy ---
                    sp = sp_ref[s]

                    @pl.when(sp > 0)
                    def _(s=s, sp=sp):
                        e = stack_ref[s, sp - 1]
                        v = lax.shift_right_logical(e, 8)
                        mask = e & 255
                        low = mask & -mask
                        ci = ((low >= 2).astype(jnp.int32)
                              + (low >= 4) + (low >= 8) + (low >= 16)
                              + (low >= 32) + (low >= 64) + (low >= 128))
                        rem = mask & (mask - 1)
                        keep = rem != 0
                        sp1 = sp - 1 + keep.astype(jnp.int32)

                        @pl.when(keep)
                        def _():
                            stack_ref[s, sp - 1] = (e & ~255) | rem

                        child = child_s[v * 8 + ci]

                        def leaf_fn(sp1):
                            cl = -child - 1
                            v0x = tri_ref[cl, 0:1, :]
                            v0y = tri_ref[cl, 1:2, :]
                            v0z = tri_ref[cl, 2:3, :]
                            e1x = tri_ref[cl, 3:4, :]
                            e1y = tri_ref[cl, 4:5, :]
                            e1z = tri_ref[cl, 5:6, :]
                            e2x = tri_ref[cl, 6:7, :]
                            e2y = tri_ref[cl, 7:8, :]
                            e2z = tri_ref[cl, 8:9, :]
                            back = tri_ref[cl, 9:10, :]
                            o_x = o_col[s, 0]
                            o_y = o_col[s, 1]
                            o_z = o_col[s, 2]
                            d_x = d_col[s, 0]
                            d_y = d_col[s, 1]
                            d_z = d_col[s, 2]
                            px = d_y * e2z - d_z * e2y
                            py = d_z * e2x - d_x * e2z
                            pz = d_x * e2y - d_y * e2x
                            det = e1x * px + e1y * py + e1z * pz
                            dd = jnp.where(back > 0.5, jnp.abs(det), det)
                            ok = dd > DET_EPS
                            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                            bx = o_x - v0x
                            by = o_y - v0y
                            bz = o_z - v0z
                            u = (bx * px + by * py + bz * pz) * inv_det
                            qx = by * e1z - bz * e1y
                            qy = bz * e1x - bx * e1z
                            qz = bx * e1y - by * e1x
                            w = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                            ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0)
                            ok &= (u + w <= 1.0)
                            bt = best_t[s]
                            ok &= (t > T_MIN_STATIC) & (t < bt)
                            tt = jnp.where(ok, t, BIG)
                            new_t = jnp.min(tt, axis=1, keepdims=True)
                            new_i = jnp.argmin(tt, axis=1).astype(
                                jnp.int32)[:, None]
                            better = new_t < bt
                            best_i[s] = jnp.where(
                                better, cl * CLUSTER + new_i, best_i[s])
                            best_t[s] = jnp.where(better, new_t, bt)
                            return sp1

                        def internal_fn(sp1):
                            lo_x = aabbL[child, 0:1, :]
                            lo_y = aabbL[child, 1:2, :]
                            lo_z = aabbL[child, 2:3, :]
                            hi_x = aabbL[child, 3:4, :]
                            hi_y = aabbL[child, 4:5, :]
                            hi_z = aabbL[child, 5:6, :]
                            o_x = o_col[s, 0]
                            o_y = o_col[s, 1]
                            o_z = o_col[s, 2]
                            ix = inv_col[s, 0]
                            iy = inv_col[s, 1]
                            iz = inv_col[s, 2]
                            tx0 = (lo_x - o_x) * ix
                            tx1 = (hi_x - o_x) * ix
                            ty0 = (lo_y - o_y) * iy
                            ty1 = (hi_y - o_y) * iy
                            tz0 = (lo_z - o_z) * iz
                            tz1 = (hi_z - o_z) * iz
                            near = jnp.maximum(
                                jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
                            far = jnp.minimum(
                                jnp.minimum(jnp.maximum(tx0, tx1),
                                            jnp.maximum(ty0, ty1)),
                                jnp.minimum(jnp.maximum(tz0, tz1),
                                            best_t[s]))
                            hit = near <= far
                            bits = jnp.sum(jnp.where(hit, lanebits, 0))

                            @pl.when(bits != 0)
                            def _():
                                stack_ref[s, sp1] = (
                                    lax.shift_left(child, 8) | bits)

                            return sp1 + (bits != 0).astype(jnp.int32)

                        # child == 0 (empty slot): no-op
                        def empty_fn(sp1):
                            return sp1

                        sp_ref[s] = lax.cond(
                            child < 0, leaf_fn,
                            lambda sp1: lax.cond(
                                child > 0, internal_fn, empty_fn, sp1),
                            sp1)

                return it + 1

            final = lax.while_loop(cond, body, jnp.int32(0))

            # flush slots that finished on the last iteration
            for s in range(n_slots):
                pid = pid_ref[s]

                @pl.when(pid >= 0)
                def _(s=s, pid=pid):
                    g = lax.div(pid, 128)
                    c = lax.rem(pid, 128)
                    t_out[g, :, pl.ds(c, 1)] = best_t[s]
                    i_out[g, :, pl.ds(c, 1)] = best_i[s]

        pl.run_scoped(
            run,
            stack_ref=pltpu.SMEM((n_slots, STACK), jnp.int32),
            sp_ref=pltpu.SMEM((n_slots,), jnp.int32),
            pid_ref=pltpu.SMEM((n_slots,), jnp.int32),
            ctr_ref=pltpu.SMEM((1,), jnp.int32),
            best_t=pltpu.VMEM((n_slots, R, 1), jnp.float32),
            best_i=pltpu.VMEM((n_slots, R, 1), jnp.int32),
            o_col=pltpu.VMEM((n_slots, 3, R, 1), jnp.float32),
            d_col=pltpu.VMEM((n_slots, 3, R, 1), jnp.float32),
            inv_col=pltpu.VMEM((n_slots, 3, R, 1), jnp.float32),
        )

    return _kernel


def _to_groups(a):
    """(N,) -> (N/1024, 8, 128): [g, r, c] = a[(g*128 + c)*8 + r]."""
    return jnp.transpose(a.reshape(-1, 128, R), (0, 2, 1))


def _from_groups(a):
    return jnp.transpose(a, (0, 2, 1)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("n_slots",))
def traverse(child8, aabbL, tri_geom, org, dirn, t_max, *, n_slots=8):
    n = org.shape[0]
    args = [
        _to_groups(org[:, 0]), _to_groups(org[:, 1]), _to_groups(org[:, 2]),
        _to_groups(dirn[:, 0]), _to_groups(dirn[:, 1]), _to_groups(dirn[:, 2]),
        _to_groups(t_max),
    ]
    n_groups = args[0].shape[0]
    t, idx = pl.pallas_call(
        make_kernel(n_slots),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, R, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(child8.reshape(-1), aabbL, *args, tri_geom)
    return _from_groups(t)[:n], _from_groups(idx)[:n]


def lane_aabb(pack):
    """(n8, 8children, 128lane[0:6]=lo/hi) -> (n8, 6, 128) children on
    lanes, padded so lanes >= 8 never hit."""
    a = np.asarray(pack.bvh8_aabb)  # (n8, 8, 128)
    n8 = a.shape[0]
    out = np.zeros((n8, 6, 128), np.float32)
    out[:, 0:3, :] = BIG
    out[:, 3:6, :] = -BIG
    for comp in range(6):
        out[:, comp, 0:8] = a[:, :, comp]
    # empty children (id 0): kill their AABB
    child = np.asarray(pack.bvh8_child)  # (n8, 8)
    empty = child == 0
    for comp in range(3):
        out[:, comp, 0:8] = np.where(empty, BIG, out[:, comp, 0:8])
        out[:, 3 + comp, 0:8] = np.where(empty, -BIG, out[:, 3 + comp, 0:8])
    return jnp.asarray(out)


def main():
    scene = models.build("cornell_dragon")
    pack, static = sc.compile_scene(scene)
    print(f"clusters={pack.tri_geom.shape[0]} n8={pack.bvh8_aabb.shape[0]}",
          flush=True)
    aabbL = lane_aabb(pack)
    child8 = jnp.asarray(np.asarray(pack.bvh8_child), jnp.int32)

    d = np.load("/root/repo/.scratch/steady_state.npz")
    org = jnp.asarray(d["org"])
    dirn = jnp.asarray(d["dirn"])
    alive = jnp.asarray(d["alive"])
    perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
    org, dirn, alive = org[perm], dirn[perm], alive[perm]
    tmax = jnp.where(alive, BIG, 0.0).astype(jnp.float32)
    org, dirn, tmax = map(jax.block_until_ready, (org, dirn, tmax))
    N = org.shape[0]

    def bench(f, label, reps=5):
        o = jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
        dt = (time.time() - t0) / reps * 1e3
        print(f"{label:30s} {dt:8.1f} ms  {N/dt*1e3/1e6:6.2f} Mray/s",
              flush=True)
        return f()

    prod = jax.jit(
        lambda o, dd, tm: pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))
    t_ref, i_ref = bench(lambda: prod(org, dirn, tmax), "production TILE=128")

    for slots in (8, 4):
        f = lambda: traverse(child8, aabbL, pack.tri_geom, org, dirn, tmax,
                             n_slots=slots)
        t6, i6 = bench(f, f"v6 octo P={slots}")
        match = float(jnp.mean((i6 == i_ref) | ~alive))
        tmatch = float(jnp.mean(
            (jnp.abs(t6 - t_ref) < 1e-5) | ~alive))
        print(f"   id match {match:.6f}  t match {tmatch:.6f}", flush=True)


if __name__ == "__main__":
    main()
