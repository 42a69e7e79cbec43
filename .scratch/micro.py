"""Microbenchmarks that decide the traversal-kernel redesign:

  M2  vector->scalar sync cost: per-iteration latency of a loop whose
      scalar control depends on a vector reduction.
  M1s scalar pointer-chase with SMEM reads only (traversal skeleton).
  M1v same but the 6 AABB floats come from dynamic VMEM scalar reads.
  M3  leaf loop: dynamic-lane ray slice + (8,128) MT + best update,
      scalar-driven cluster ids from SMEM, no syncs.

Each kernel runs N_ITERS iterations; report ns/iter.
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


def bench(fn, label, iters=N_ITERS, reps=3):
    o = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        o = fn()
    jax.block_until_ready(o)
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.1f} ms  {dt/iters*1e9:7.1f} ns/iter",
          flush=True)


# ---------------------------------------------------------------- M2
def m2_kernel(x_ref, o_ref):
    def body(c):
        i, acc = c
        v = x_ref[...] * (acc.astype(jnp.float32) * 1e-9 + 1.0)
        s = jnp.sum(v) > 0.0          # vector -> scalar
        return i + 1, acc + s.astype(jnp.int32)

    def cond(c):
        return c[0] < N_ITERS

    _, acc = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    o_ref[0] = acc


def m2():
    x = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        m2_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
    )(x)


# ---------------------------------------------------------------- M1s
# scalar chase: node table in SMEM (ids) + 6 aabb floats in SMEM;
# conservative slab test entirely scalar; pseudo-random walk.
def m1s_kernel(child_ref, box_ref, o_ref):
    n = 4096

    def body(c):
        i, v, acc = c
        # 6 scalar loads + slab arithmetic
        lo0 = box_ref[v * 6 + 0]
        lo1 = box_ref[v * 6 + 1]
        lo2 = box_ref[v * 6 + 2]
        hi0 = box_ref[v * 6 + 3]
        hi1 = box_ref[v * 6 + 4]
        hi2 = box_ref[v * 6 + 5]
        t0 = jnp.maximum(jnp.maximum(lo0 * 0.5 - 1.0, lo1 * 0.5 - 1.0),
                         lo2 * 0.5 - 1.0)
        t1 = jnp.minimum(jnp.minimum(hi0 * 0.5 + 1.0, hi1 * 0.5 + 1.0),
                         hi2 * 0.5 + 1.0)
        hit = t0 <= t1
        nxt = child_ref[v]
        v2 = jnp.where(hit, nxt, v + 1)
        v2 = lax.rem(v2, jnp.int32(n))
        return i + 1, v2, acc + t0

    def cond(c):
        return c[0] < N_ITERS

    _, v, acc = lax.while_loop(cond, body,
                               (jnp.int32(0), jnp.int32(0), jnp.float32(0)))
    o_ref[0] = acc + v.astype(jnp.float32)


def m1s():
    n = 4096
    rng = np.random.default_rng(0)
    child = jnp.asarray(rng.integers(0, n, (n,)), jnp.int32)
    box = jnp.asarray(rng.random((n * 6,)), jnp.float32)
    return pl.pallas_call(
        m1s_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(child, box)


# ---------------------------------------------------------------- M1v
# same walk but AABB floats read from VMEM (n, 8) rows via one dynamic
# (1,8)->... use scalar loads from a VMEM ref.
def m1v_kernel(child_ref, box_ref, o_ref):
    n = 4096

    def body(c):
        i, v, acc = c
        lo0 = box_ref[v, 0]
        lo1 = box_ref[v, 1]
        lo2 = box_ref[v, 2]
        hi0 = box_ref[v, 3]
        hi1 = box_ref[v, 4]
        hi2 = box_ref[v, 5]
        t0 = jnp.maximum(jnp.maximum(lo0 * 0.5 - 1.0, lo1 * 0.5 - 1.0),
                         lo2 * 0.5 - 1.0)
        t1 = jnp.minimum(jnp.minimum(hi0 * 0.5 + 1.0, hi1 * 0.5 + 1.0),
                         hi2 * 0.5 + 1.0)
        hit = t0 <= t1
        nxt = child_ref[v]
        v2 = jnp.where(hit, nxt, v + 1)
        v2 = lax.rem(v2, jnp.int32(n))
        return i + 1, v2, acc + t0

    def cond(c):
        return c[0] < N_ITERS

    _, v, acc = lax.while_loop(cond, body,
                               (jnp.int32(0), jnp.int32(0), jnp.float32(0)))
    o_ref[0] = acc + v.astype(jnp.float32)


def m1v():
    n = 4096
    rng = np.random.default_rng(0)
    child = jnp.asarray(rng.integers(0, n, (n,)), jnp.int32)
    box = jnp.asarray(rng.random((n, 8)), jnp.float32)
    return pl.pallas_call(
        m1v_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(child, box)


# ---------------------------------------------------------------- M3
# leaf loop: cluster ids from SMEM; rays sliced (8,1) by dynamic lane
# once per 8 iters; (8,128) MT; vector best updates; no syncs.
M3_ITERS = 50_000


def m3_kernel(cl_ref, rays_ref, tri_ref, t_out):
    def run(best_t, best_i, o_col, d_col):
        def body(c):
            i, _ = c

            @pl.when(lax.rem(i, jnp.int32(8)) == 0)
            def _():
                p = lax.rem(i, jnp.int32(rays_ref.shape[0] * 128))
                g = lax.div(p, 128)
                cc = lax.rem(p, 128)
                sl = (g, slice(None), pl.ds(cc, 1))
                col = pl.load(rays_ref, sl)      # (8,1) per component set
                o_col[0:8] = col
                d_col[0:8] = col * 0.5 + 0.1
                best_t[...] = jnp.full((8, 1), 3.4e38, jnp.float32)
                best_i[...] = jnp.full((8, 1), -1, jnp.int32)

            cl = cl_ref[lax.rem(i, jnp.int32(4096))]
            v0x = tri_ref[cl, 0:1, :]
            v0y = tri_ref[cl, 1:2, :]
            v0z = tri_ref[cl, 2:3, :]
            e1x = tri_ref[cl, 3:4, :]
            e1y = tri_ref[cl, 4:5, :]
            e1z = tri_ref[cl, 5:6, :]
            e2x = tri_ref[cl, 6:7, :]
            e2y = tri_ref[cl, 7:8, :]
            e2z = tri_ref[cl, 8:9, :]
            o_x = o_col[0:8]
            d_x = d_col[0:8]
            o_y = o_x * 0.9
            o_z = o_x * 1.1
            d_y = d_x * 0.8
            d_z = d_x * 1.2
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
            bt = best_t[...]
            ok &= (t > 1e-3) & (t < bt)
            tt = jnp.where(ok, t, 3.4e38)
            new_t = jnp.min(tt, axis=1, keepdims=True)
            new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
            better = new_t < bt
            best_i[...] = jnp.where(better, cl * 128 + new_i, best_i[...])
            best_t[...] = jnp.where(better, new_t, bt)
            return i + 1, 0

        def cond(c):
            return c[0] < M3_ITERS

        lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        t_out[...] = best_t[...]

    pl.run_scoped(
        run,
        best_t=pltpu.VMEM((8, 1), jnp.float32),
        best_i=pltpu.VMEM((8, 1), jnp.int32),
        o_col=pltpu.VMEM((8, 1), jnp.float32),
        d_col=pltpu.VMEM((8, 1), jnp.float32),
    )


def m3():
    rng = np.random.default_rng(0)
    cl = jnp.asarray(rng.integers(0, 512, (4096,)), jnp.int32)
    rays = jnp.asarray(rng.random((32, 8, 128)), jnp.float32)
    tri = jnp.asarray(rng.random((512, 16, 128)), jnp.float32)
    return pl.pallas_call(
        m3_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
    )(cl, rays, tri)


if __name__ == "__main__":
    bench(m2, "M2 vector->scalar sync loop")
    bench(m1s, "M1s scalar chase, AABB in SMEM")
    bench(m1v, "M1v scalar chase, AABB scalar-from-VMEM")
    bench(m3, "M3 leaf MT (8,128) no-sync loop", iters=M3_ITERS)
