"""Round-3 microbenchmarks: cost of a dense *batched* MT work loop —
the core of the static-pipeline kernel design.

  M3a  1 MT (8,128) tile per fori iteration, pair ids from SMEM
  M3b  8 MT tiles per fori iteration
  M6   dynamic-lane (8,1) ray-column slice + store, per iteration
  M7   8 MT tiles per iteration + per-batch best flush w/ dynamic lane store
"""
import time

import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def lane_extract(tile, c):
    """(8,128) tile, scalar lane c -> (8,1) column via one-hot reduce."""
    lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return jnp.sum(jnp.where(lane == c, tile, 0.0), axis=1, keepdims=True)


def lane_insert(tile, c, col):
    """write (8,1) col into lane c of (8,128) tile."""
    lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return jnp.where(lane == c, col, tile)


N_PAIRS = 131072  # total MT tile-visits per kernel call


def bench(fn, label, units=N_PAIRS, reps=3):
    o = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        o = fn()
    jax.block_until_ready(o)
    dt = (time.time() - t0) / reps
    print(f"{label:46s} {dt*1e3:8.1f} ms  {dt/units*1e9:7.1f} ns/unit",
          flush=True)


def mt_tile(tri_ref, cl, o_x, o_y, o_z, d_x, d_y, d_z, bt):
    v0x = tri_ref[cl, 0:1, :]
    v0y = tri_ref[cl, 1:2, :]
    v0z = tri_ref[cl, 2:3, :]
    e1x = tri_ref[cl, 3:4, :]
    e1y = tri_ref[cl, 4:5, :]
    e1z = tri_ref[cl, 5:6, :]
    e2x = tri_ref[cl, 6:7, :]
    e2y = tri_ref[cl, 7:8, :]
    e2z = tri_ref[cl, 8:9, :]
    px = d_y * e2z - d_z * e2y
    py = d_z * e2x - d_x * e2z
    pz = d_x * e2y - d_y * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = det > 1e-12
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
    ok &= (t > 1e-3) & (t < bt)
    tt = jnp.where(ok, t, 3.4e38)
    new_t = jnp.min(tt, axis=1, keepdims=True)
    new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
    return new_t, new_i


def make_m3(batch):
    def kernel(pair_ref, rays_ref, tri_ref, t_out):
        def run(best_t, best_i, o_col, d_col):
            o_col[...] = lane_extract(rays_ref[0], jnp.int32(0))
            d_col[...] = lane_extract(rays_ref[0], jnp.int32(1)) * 0.5 + 0.1
            best_t[...] = jnp.full((8, 1), 3.4e38, jnp.float32)
            best_i[...] = jnp.full((8, 1), -1, jnp.int32)

            def body(i, _):
                o_x = o_col[...]
                d_x = d_col[...]
                o_y = o_x * 0.9
                o_z = o_x * 1.1
                d_y = d_x * 0.8
                d_z = d_x * 1.2
                for b in range(batch):
                    cl = pair_ref[i * batch + b]
                    bt = best_t[...]
                    new_t, new_i = mt_tile(tri_ref, cl, o_x, o_y, o_z,
                                           d_x, d_y, d_z, bt)
                    better = new_t < bt
                    best_i[...] = jnp.where(better, cl * 128 + new_i,
                                            best_i[...])
                    best_t[...] = jnp.where(better, new_t, bt)
                return 0

            lax.fori_loop(0, N_PAIRS // batch, body, 0)
            t_out[...] = best_t[...]

        pl.run_scoped(
            run,
            best_t=pltpu.VMEM((8, 1), jnp.float32),
            best_i=pltpu.VMEM((8, 1), jnp.int32),
            o_col=pltpu.VMEM((8, 1), jnp.float32),
            d_col=pltpu.VMEM((8, 1), jnp.float32),
        )

    def run():
        rng = np.random.default_rng(0)
        pair = jnp.asarray(rng.integers(0, 512, (N_PAIRS,)), jnp.int32)
        rays = jnp.asarray(rng.random((32, 8, 128)), jnp.float32)
        tri = jnp.asarray(rng.random((512, 16, 128)), jnp.float32)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        )(pair, rays, tri)

    return run


N_SLICE = 131072


def m6_kernel(idx_ref, rays_ref, out_ref):
    def run(acc):
        acc[...] = jnp.zeros((8, 1), jnp.float32)

        def body(i, _):
            p = idx_ref[i]
            g = lax.div(p, 128)
            c = lax.rem(p, 128)
            col = lane_extract(rays_ref[g], c)
            acc[...] = acc[...] + col
            return 0

        lax.fori_loop(0, N_SLICE, body, 0)
        out_ref[...] = acc[...]

    pl.run_scoped(run, acc=pltpu.VMEM((8, 1), jnp.float32))


def m6():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 32 * 128, (N_SLICE,)), jnp.int32)
    rays = jnp.asarray(rng.random((32, 8, 128)), jnp.float32)
    return pl.pallas_call(
        m6_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
    )(idx, rays)


def m7_kernel(pair_ref, pk_ref, rays_ref, tri_ref, t_out):  # noqa
    batch = 8

    def run(best_t, best_i, o_col, d_col):
        o_col[...] = rays_ref[0, :, 0:1] * 1.0
        d_col[...] = rays_ref[0, :, 1:2] * 0.5 + 0.1
        best_t[...] = jnp.full((8, 1), 3.4e38, jnp.float32)
        best_i[...] = jnp.full((8, 1), -1, jnp.int32)

        def body(i, prev_pk):
            o_x = o_col[...]
            d_x = d_col[...]
            o_y = o_x * 0.9
            o_z = o_x * 1.1
            d_y = d_x * 0.8
            d_z = d_x * 1.2
            for b in range(batch):
                j = i * batch + b
                cl = pair_ref[j]
                pk = pk_ref[j]
                flush = pk != prev_pk

                @pl.when(flush)
                def _(pk=pk, prev_pk=prev_pk):
                    g = lax.div(prev_pk, 128)
                    c = lax.rem(prev_pk, 128)
                    t_out[g] = lane_insert(t_out[g], c, best_t[...])
                    best_t[...] = jnp.full((8, 1), 3.4e38, jnp.float32)
                    g2 = lax.div(pk, 128)
                    c2 = lax.rem(pk, 128)
                    o_col[...] = lane_extract(rays_ref[g2], c2)

                prev_pk = pk
                bt = best_t[...]
                new_t, new_i = mt_tile(tri_ref, cl, o_x, o_y, o_z,
                                       d_x, d_y, d_z, bt)
                better = new_t < bt
                best_i[...] = jnp.where(better, cl * 128 + new_i, best_i[...])
                best_t[...] = jnp.where(better, new_t, bt)
            return prev_pk

        lax.fori_loop(0, N_PAIRS // batch, body, jnp.int32(0))

    pl.run_scoped(
        run,
        best_t=pltpu.VMEM((8, 1), jnp.float32),
        best_i=pltpu.VMEM((8, 1), jnp.int32),
        o_col=pltpu.VMEM((8, 1), jnp.float32),
        d_col=pltpu.VMEM((8, 1), jnp.float32),
    )


def m7():
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.integers(0, 512, (N_PAIRS,)), jnp.int32)
    # ~1 flush per 16 pairs
    pk = jnp.asarray(np.sort(rng.integers(0, N_PAIRS // 16, (N_PAIRS,))),
                     jnp.int32)
    rays = jnp.asarray(rng.random((64, 8, 128)), jnp.float32)
    tri = jnp.asarray(rng.random((512, 16, 128)), jnp.float32)
    return pl.pallas_call(
        m7_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 8, 128), jnp.float32),
    )(pair, pk, rays, tri)


if __name__ == "__main__":
    bench(make_m3(1), "M3a 1 MT tile per iter")
    bench(make_m3(8), "M3b 8 MT tiles per iter")
    bench(m6, "M6 dynamic-lane (8,1) slice per iter", units=N_SLICE)
    bench(m7, "M7 8 MT/iter + flush + lane store")
