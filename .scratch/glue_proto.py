"""Prototype + timing of the XLA glue for the static cull->MT pipeline:

  1. per-ray supernode cull (N, S) + packet any-reduce
  2. pairs1 extraction via nonzero(size=CAP1)
  3. pairs2 extraction from a (CAP1, 128) int8 mask
  4. the pool-side packet transpose helpers

All plain XLA — fast compiles; run on TPU for real timings.
"""
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 1 << 18
S = 78
CAP1 = (N // 8) * 16
CAP2 = (N // 8) * 48

rng = np.random.default_rng(0)
org = jnp.asarray(rng.uniform(0, 555, (N, 3)), jnp.float32)
dirn = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
tmax = jnp.asarray(rng.uniform(100, 1000, (N,)), jnp.float32)
sup_lo = jnp.asarray(rng.uniform(0, 500, (S, 3)), jnp.float32)
sup_hi = sup_lo + jnp.asarray(rng.uniform(10, 150, (S, 3)), jnp.float32)


@jax.jit
def cull_and_pairs1(org, dirn, tmax, sup_lo, sup_hi):
    inv = 1.0 / dirn
    t0 = (sup_lo[None] - org[:, None]) * inv[:, None]   # (N, S, 3)
    t1 = (sup_hi[None] - org[:, None]) * inv[:, None]
    near = jnp.minimum(t0, t1).max(2)
    far = jnp.maximum(t0, t1).min(2)
    hit = (near <= far) & (far > 1e-3) & (near < tmax[:, None])
    pk_hit = hit.reshape(N // 8, 8, S).any(1)           # (P, S)
    flat = pk_hit.reshape(-1)
    idx = jnp.nonzero(flat, size=CAP1, fill_value=jnp.int32(-1))[0]
    n1 = jnp.sum(flat, dtype=jnp.int32)
    return (idx // S).astype(jnp.int32), (idx % S).astype(jnp.int32), n1


@jax.jit
def pairs2_extract(mask2):
    flat = mask2.reshape(-1) != 0
    idx = jnp.nonzero(flat, size=CAP2, fill_value=jnp.int32(-1))[0]
    n2 = jnp.sum(flat, dtype=jnp.int32)
    return idx, n2


@jax.jit
def to_groups(org):
    return jnp.transpose(org.reshape(-1, 128, 8, 3), (0, 2, 1, 3))


def bench(f, label, reps=5):
    o = jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
    t0 = time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"{label:38s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    bench(lambda: cull_and_pairs1(org, dirn, tmax, sup_lo, sup_hi),
          "cull + pairs1 (N=262k, S=78)")
    m2 = jnp.asarray(rng.random((CAP1, 128)) < 0.02, jnp.int8)
    bench(lambda: pairs2_extract(m2), f"pairs2 extract ({CAP1}x128 i8)")
    bench(lambda: to_groups(org), "packet transpose (N,3)")
