"""Kernel C prototype: batched Moller-Trumbore over an extracted
(packet, cluster) pair list — the MT stage of the static cull->MT
pipeline.  Production-style outer structure: grid over pair chunks,
pair ids in SMEM blocks, rays/tri tables VMEM-resident, outputs as
constant-index_map VMEM buffers written across grid steps.

Benchmarked on synthetic pairs matching the measured cornell_dragon
steady-state distribution: ~1.18M pairs, ~36 pairs per packet,
packet-major order.
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

R = 8
BIG = 3.4e38
T_MIN = 1e-3
CHUNK = 8192
BATCH = 32


def _lane_iota():
    return lax.broadcasted_iota(jnp.int32, (R, 128), 1)


def lane_extract(tile, c):
    return jnp.sum(jnp.where(_lane_iota() == c, tile, 0.0), axis=1,
                   keepdims=True)


def _kernel(n2_ref, pk_ref, cl_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
            tri_ref, t_out, i_out, st, best_t, best_i, o_col, d_col):
    """Grid step: process CHUNK pairs from SMEM blocks.

    st (SMEM, int32): [0] prev_pk (-2 = none)
    scratch best/cols persist across grid steps.
    """
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        # init outputs to miss: t = tmax, idx = -1
        def init(g, _):
            t_out[g] = tmax_ref[g]
            i_out[g] = jnp.full((R, 128), -1, jnp.int32)
            return 0

        lax.fori_loop(0, ox.shape[0], init, 0)
        st[0] = jnp.int32(-2)

    base = step * CHUNK
    n2 = n2_ref[0]

    def flush(prev_pk):
        g = lax.div(prev_pk, 128)
        c = lax.rem(prev_pk, 128)
        lane = _lane_iota()
        onehot = lane == c
        t_out[g] = jnp.where(onehot, best_t[...], t_out[g])
        i_out[g] = jnp.where(onehot, best_i[...], i_out[g])

    def load_packet(pk):
        g = lax.div(pk, 128)
        c = lax.rem(pk, 128)
        o_col[0] = lane_extract(ox[g], c)
        o_col[1] = lane_extract(oy[g], c)
        o_col[2] = lane_extract(oz[g], c)
        d_col[0] = lane_extract(dx[g], c)
        d_col[1] = lane_extract(dy[g], c)
        d_col[2] = lane_extract(dz[g], c)
        best_t[...] = lane_extract(tmax_ref[g], c)
        best_i[...] = jnp.full((R, 1), -1, jnp.int32)

    def body(it, _):
        for b in range(BATCH):
            j = it * BATCH + b
            pk = pk_ref[j]
            valid = pk >= 0
            prev = st[0]
            change = valid & (pk != prev)

            @pl.when(change)
            def _(pk=pk, prev=prev):
                @pl.when(prev >= 0)
                def _():
                    flush(prev)

                load_packet(pk)
                st[0] = pk

            @pl.when(valid)
            def _(j=j):
                cl = cl_ref[j]
                o_x = o_col[0]
                o_y = o_col[1]
                o_z = o_col[2]
                d_x = d_col[0]
                d_y = d_col[1]
                d_z = d_col[2]
                blkv = tri_ref[cl]          # one (16,128) dynamic load
                v0x = blkv[0:1, :]
                v0y = blkv[1:2, :]
                v0z = blkv[2:3, :]
                e1x = blkv[3:4, :]
                e1y = blkv[4:5, :]
                e1z = blkv[5:6, :]
                e2x = blkv[6:7, :]
                e2y = blkv[7:8, :]
                e2z = blkv[8:9, :]
                back = blkv[9:10, :]
                px = d_y * e2z - d_z * e2y
                py = d_z * e2x - d_x * e2z
                pz = d_x * e2y - d_y * e2x
                det = e1x * px + e1y * py + e1z * pz
                dd = jnp.where(back > 0.5, jnp.abs(det), det)
                ok = dd > 1e-12
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
                ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0) & (u + w <= 1.0)
                bt = best_t[...]
                ok &= (t > T_MIN) & (t < bt)
                tt = jnp.where(ok, t, BIG)
                new_t = jnp.min(tt, axis=1, keepdims=True)
                new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                better = new_t < bt
                best_i[...] = jnp.where(better, cl * 128 + new_i, best_i[...])
                best_t[...] = jnp.where(better, new_t, bt)

        return 0

    lax.fori_loop(0, CHUNK // BATCH, body, 0)

    @pl.when(step == n_steps - 1)
    def _():
        prev = st[0]

        @pl.when(prev >= 0)
        def _():
            flush(prev)


@functools.partial(jax.jit, static_argnames=())
def mt_pairs(n2, pk, cl, rays_g, tmax_g, tri_geom):
    """rays_g: 6 arrays (G, 8, 128); tmax_g (G, 8, 128); pk/cl (CAP2,)."""
    cap2 = pk.shape[0]
    G = rays_g[0].shape[0]
    grid = (cap2 // CHUNK,)
    blk = pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fullc = pl.BlockSpec(
        rays_g[0].shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk]
        + [fullc] * 7 + [full],
        out_specs=[fullc, fullc],
        out_shape=[
            jax.ShapeDtypeStruct((G, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.int32),
            pltpu.VMEM((3, R, 1), jnp.float32),
            pltpu.VMEM((3, R, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(jnp.asarray([n2], jnp.int32), pk, cl, *rays_g, tmax_g, tri_geom)
    return t, idx


def main():
    rng = np.random.default_rng(0)
    N = 1 << 18
    P = N // R
    G = P // 128
    # synthetic realistic pair list: per packet ~36 clusters, packet-major
    n_per = rng.poisson(36, P).clip(1, 120)
    pk_list = np.repeat(np.arange(P, dtype=np.int32), n_per)
    n2 = len(pk_list)
    cl_list = rng.integers(0, 9918, n2).astype(np.int32)
    CAP2 = -(-max(n2, 1) // CHUNK) * CHUNK + CHUNK
    pk = np.full(CAP2, -1, np.int32)
    cl = np.zeros(CAP2, np.int32)
    pk[:n2] = pk_list
    cl[:n2] = cl_list
    print(f"pairs={n2} CAP2={CAP2} packets={P}", flush=True)

    rays_g = [jnp.asarray(rng.random((G, R, 128)), jnp.float32)
              for _ in range(6)]
    tmax_g = jnp.full((G, R, 128), 900.0, jnp.float32)
    tri = jnp.asarray(rng.random((9918, 16, 128)), jnp.float32)
    pk_d = jnp.asarray(pk)
    cl_d = jnp.asarray(cl)

    def f():
        return mt_pairs(n2, pk_d, cl_d, rays_g, tmax_g, tri)

    t_g, i_g = f()
    t_g, i_g = map(np.asarray, (t_g, i_g))
    hit_frac = float((i_g >= 0).mean())
    print(f"output: hit fraction {hit_frac:.4f}  t range "
          f"[{t_g.min():.3g}, {t_g.max():.3g}]", flush=True)

    # numpy oracle on a few packets
    def col(a, pkt):
        g, c = pkt // 128, pkt % 128
        return np.asarray(a[g, :, c])
    tri_np = np.asarray(tri)
    bad = 0
    for pkt in [0, 1, 57, 1000, 31000]:
        o8 = np.stack([col(rays_g[k], pkt) for k in range(3)], -1)
        d8 = np.stack([col(rays_g[k], pkt) for k in range(3, 6)], -1)
        cls = cl_list[pk_list == pkt]
        bt = np.full(8, 900.0); bi = np.full(8, -1)
        for clx in cls:
            v0 = tri_np[clx, 0:3].T; e1 = tri_np[clx, 3:6].T; e2 = tri_np[clx, 6:9].T
            for r in range(8):
                pv = np.cross(d8[r], e2)
                det = (e1 * pv).sum(1)
                ok = det > 1e-12
                inv = 1.0 / np.where(det == 0, 1, det)
                b = o8[r] - v0
                u = (b * pv).sum(1) * inv
                q = np.cross(b, e1)
                w = (d8[r][None] * q).sum(1) * inv
                t = (e2 * q).sum(1) * inv
                ok &= (u >= 0) & (u <= 1) & (w >= 0) & (u + w <= 1)
                ok &= (t > 1e-3) & (t < bt[r])
                tt = np.where(ok, t, 3.4e38)
                j = tt.argmin()
                if tt[j] < bt[r]:
                    bt[r] = tt[j]; bi[r] = clx * 128 + j
        got_t = col(t_g.reshape(G, 8, 128) if t_g.ndim != 3 else t_g, pkt)
        got_i = col(i_g, pkt)
        if not (np.allclose(got_t, bt, rtol=1e-5) and (got_i == bi).all()):
            bad += 1
            print(f"  packet {pkt}: MISMATCH got_t={got_t[:3]} want={bt[:3]} "
                  f"got_i={got_i[:3]} want={bi[:3]}")
    print(f"oracle check: {'OK' if bad == 0 else f'{bad} bad'}", flush=True)

    o = jax.block_until_ready(f()[0])
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        o = f()
    jax.block_until_ready(o[0])
    dt = (time.time() - t0) / reps
    print(f"kernel C: {dt*1e3:.1f} ms  ({dt/n2*1e9:.0f} ns/pair, "
          f"{n2/dt/1e6:.1f} Mpairs/s)", flush=True)


if __name__ == "__main__":
    main()
