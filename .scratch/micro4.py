"""Round-4 microbenchmarks: loop-carry style.  Hypothesis: while/fori
carries (tuples of scalars) roundtrip through VMEM with syncs (~2-4us /
iter); loops whose state lives in SMEM refs with a trivial carry run at
production speed (~300 ns).

  M4b  int chase, state in SMEM refs, while cond reads refs
  M3c  MT tile loop, counter in SMEM ref
  M6b  lane_extract loop, counter in SMEM ref
"""
import time

import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_ITERS = 200_000


def bench(fn, label, units=N_ITERS, reps=3):
    o = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        o = fn()
    jax.block_until_ready(o)
    dt = (time.time() - t0) / reps
    print(f"{label:46s} {dt*1e3:8.1f} ms  {dt/units*1e9:7.1f} ns/unit",
          flush=True)


def lane_extract(tile, c):
    lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return jnp.sum(jnp.where(lane == c, tile, 0.0), axis=1, keepdims=True)


# ---------------------------------------------------------------- M4b
def m4b_kernel(child_ref, o_ref):
    def run(st):
        st[0] = jnp.int32(0)   # i
        st[1] = jnp.int32(0)   # v
        st[2] = jnp.int32(0)   # acc

        def cond(_):
            return st[0] < N_ITERS

        def body(_):
            i = st[0]
            v = st[1]
            nxt = child_ref[v]
            v2 = (nxt + i) & 4095
            st[1] = v2
            st[2] = st[2] ^ v2
            st[0] = i + 1
            return 0

        lax.while_loop(cond, body, 0)
        o_ref[0] = st[2] + st[1]

    pl.run_scoped(run, st=pltpu.SMEM((4,), jnp.int32))


def m4b():
    rng = np.random.default_rng(0)
    child = jnp.asarray(rng.integers(0, 4096, (4096,)), jnp.int32)
    return pl.pallas_call(
        m4b_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
    )(child)


# ---------------------------------------------------------------- M3c
N_MT = 131072


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


def m3c_kernel(pair_ref, rays_ref, tri_ref, t_out):
    def run(st, best_t, best_i, o_col, d_col):
        o_col[...] = lane_extract(rays_ref[0], jnp.int32(0))
        d_col[...] = lane_extract(rays_ref[0], jnp.int32(1)) * 0.5 + 0.1
        best_t[...] = jnp.full((8, 1), 3.4e38, jnp.float32)
        best_i[...] = jnp.full((8, 1), -1, jnp.int32)
        st[0] = jnp.int32(0)

        def cond(_):
            return st[0] < N_MT

        def body(_):
            i = st[0]
            o_x = o_col[...]
            d_x = d_col[...]
            o_y = o_x * 0.9
            o_z = o_x * 1.1
            d_y = d_x * 0.8
            d_z = d_x * 1.2
            cl = pair_ref[i & 65535]
            bt = best_t[...]
            new_t, new_i = mt_tile(tri_ref, cl, o_x, o_y, o_z,
                                   d_x, d_y, d_z, bt)
            better = new_t < bt
            best_i[...] = jnp.where(better, cl * 128 + new_i, best_i[...])
            best_t[...] = jnp.where(better, new_t, bt)
            st[0] = i + 1
            return 0

        lax.while_loop(cond, body, 0)
        t_out[...] = best_t[...]

    pl.run_scoped(
        run,
        st=pltpu.SMEM((1,), jnp.int32),
        best_t=pltpu.VMEM((8, 1), jnp.float32),
        best_i=pltpu.VMEM((8, 1), jnp.int32),
        o_col=pltpu.VMEM((8, 1), jnp.float32),
        d_col=pltpu.VMEM((8, 1), jnp.float32),
    )


def m3c():
    rng = np.random.default_rng(0)
    pair = jnp.asarray(rng.integers(0, 512, (65536,)), jnp.int32)
    rays = jnp.asarray(rng.random((32, 8, 128)), jnp.float32)
    tri = jnp.asarray(rng.random((512, 16, 128)), jnp.float32)
    return pl.pallas_call(
        m3c_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
    )(pair, rays, tri)


# ---------------------------------------------------------------- M6b
def m6b_kernel(idx_ref, rays_ref, out_ref):
    def run(st, acc):
        acc[...] = jnp.zeros((8, 1), jnp.float32)
        st[0] = jnp.int32(0)

        def cond(_):
            return st[0] < N_MT

        def body(_):
            i = st[0]
            p = idx_ref[i & 65535]
            g = lax.div(p, 128)
            c = lax.rem(p, 128)
            col = lane_extract(rays_ref[g], c)
            acc[...] = acc[...] + col
            st[0] = i + 1
            return 0

        lax.while_loop(cond, body, 0)
        out_ref[...] = acc[...]

    pl.run_scoped(run, st=pltpu.SMEM((1,), jnp.int32),
                  acc=pltpu.VMEM((8, 1), jnp.float32))


def m6b():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 32 * 128, (65536,)), jnp.int32)
    rays = jnp.asarray(rng.random((32, 8, 128)), jnp.float32)
    return pl.pallas_call(
        m6b_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
    )(idx, rays)


if __name__ == "__main__":
    bench(m4b, "M4b int chase, SMEM-ref state")
    bench(m3c, "M3c MT tile loop, SMEM-ref counter", units=N_MT)
    bench(m6b, "M6b lane_extract loop, SMEM-ref counter", units=N_MT)
