"""Round-2 microbenchmarks: what exactly costs 2.2us?

  M4   pure int scalar loop (loop machinery + int ALU only)
  M5   scalar float chase, no rem (float scalar ALU cost)
  M2c  sync loop reducing (8,1) -> scalar
  M2d  sync loop reducing (1,128) -> scalar
  M2e  sync loop reducing (8,128) -> scalar, but 4 independent chains
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


# ---------------------------------------------------------------- M4
def m4_kernel(child_ref, o_ref):
    n_mask = 4095

    def body(c):
        i, v, acc = c
        nxt = child_ref[v]
        v2 = (nxt + i) & n_mask
        return i + 1, v2, acc ^ v2

    def cond(c):
        return c[0] < N_ITERS

    _, v, acc = lax.while_loop(cond, body,
                               (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    o_ref[0] = acc + v


def m4():
    rng = np.random.default_rng(0)
    child = jnp.asarray(rng.integers(0, 4096, (4096,)), jnp.int32)
    return pl.pallas_call(
        m4_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
    )(child)


# ---------------------------------------------------------------- M5
def m5_kernel(child_ref, box_ref, o_ref):
    n_mask = 4095

    def body(c):
        i, v, acc = c
        base = v * 6
        lo0 = box_ref[base]
        lo1 = box_ref[base + 1]
        lo2 = box_ref[base + 2]
        hi0 = box_ref[base + 3]
        hi1 = box_ref[base + 4]
        hi2 = box_ref[base + 5]
        t0 = jnp.maximum(jnp.maximum(lo0 * 0.5 - 1.0, lo1 * 0.5 - 1.0),
                         lo2 * 0.5 - 1.0)
        t1 = jnp.minimum(jnp.minimum(hi0 * 0.5 + 1.0, hi1 * 0.5 + 1.0),
                         hi2 * 0.5 + 1.0)
        hit = t0 <= t1
        nxt = child_ref[v]
        v2 = (jnp.where(hit, nxt, v + 1) + i) & n_mask
        return i + 1, v2, acc + t0

    def cond(c):
        return c[0] < N_ITERS

    _, v, acc = lax.while_loop(cond, body,
                               (jnp.int32(0), jnp.int32(0), jnp.float32(0)))
    o_ref[0] = acc + v.astype(jnp.float32)


def m5():
    rng = np.random.default_rng(0)
    child = jnp.asarray(rng.integers(0, 4096, (4096,)), jnp.int32)
    box = jnp.asarray(rng.random((4096 * 6,)), jnp.float32)
    return pl.pallas_call(
        m5_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(child, box)


# ---------------------------------------------------------------- M2 family
def make_m2(shape, chains):
    def kernel(x_ref, o_ref):
        def body(c):
            i, accs = c
            new = []
            for k in range(chains):
                acc = accs[k]
                v = x_ref[0:shape[0], 0:shape[1]] * (
                    acc.astype(jnp.float32) * 1e-9 + 1.0 + k)
                s = jnp.sum(v) > 0.0
                new.append(acc + s.astype(jnp.int32))
            return i + 1, tuple(new)

        def cond(c):
            return c[0] < N_ITERS // chains

        _, accs = lax.while_loop(
            cond, body, (jnp.int32(0), tuple(jnp.int32(0) for _ in range(chains))))
        o_ref[0] = sum(accs)

    def run():
        x = jnp.ones((8, 128), jnp.float32)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        )(x)

    return run


if __name__ == "__main__":
    bench(m4, "M4 int-only scalar loop")
    bench(m5, "M5 float scalar chase (no rem)")
    bench(make_m2((8, 1), 1), "M2c sync (8,1) reduce")
    bench(make_m2((1, 128), 1), "M2d sync (1,128) reduce")
    bench(make_m2((8, 128), 4), "M2e sync (8,128) x4 chains")
