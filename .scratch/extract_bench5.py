"""Measure cumsum+searchsorted extraction and gather rates on TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("backend:", jax.default_backend(), flush=True)

n_pk, nc, k = 32768, 9918, 128
rng = np.random.default_rng(0)
mask = (rng.random((n_pk, nc)) < 33.0 / nc)
mask_d = jax.device_put(jnp.asarray(mask))

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps):
        o = f(*args); jax.block_until_ready(o)
    print(f"RESULT {label:46s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return o

@jax.jit
def extract(m):
    cs = jnp.cumsum(m.astype(jnp.int32), axis=1)          # (P, nc)
    cnt = jnp.minimum(cs[:, -1], k)
    q = jnp.arange(1, k + 1, dtype=jnp.int32)[None, :]
    idx = jnp.searchsorted(cs[0], q[0])  # warm trace shape only
    # batched searchsorted via vmap
    idx = jax.vmap(lambda c, qq: jnp.searchsorted(c, qq, side="left"))(
        cs, jnp.broadcast_to(q, (m.shape[0], k)))
    return jnp.sum(idx % 97) + jnp.sum(cnt)

bench(extract, "cumsum + vmapped searchsorted (dense)", mask_d)

# manual binary search via take_along_axis (often faster than searchsorted)
@jax.jit
def extract_manual(m):
    cs = jnp.cumsum(m.astype(jnp.int32), axis=1)
    q = jnp.broadcast_to(jnp.arange(1, k + 1, dtype=jnp.int32)[None, :],
                         (m.shape[0], k))
    lo = jnp.zeros((m.shape[0], k), jnp.int32)
    hi = jnp.full((m.shape[0], k), nc - 1, jnp.int32)
    for _ in range(14):  # 2^14 > 9918
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(cs, mid, axis=1)
        go_right = v < q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.sum(lo % 97)

bench(extract_manual, "cumsum + manual binsearch (14 gathers)", mask_d)

# gather rate: (n_pk, 128) random columns from (n_pk, nc)
idxr = jax.device_put(jnp.asarray(rng.integers(0, nc, (n_pk, k)), jnp.int32))
big = jax.device_put(jnp.asarray(rng.integers(0, 100, (n_pk, nc)), jnp.int32))
bench(jax.jit(lambda b, i: jnp.sum(jnp.take_along_axis(b, i, axis=1))),
      "take_along_axis (n_pk,128) of (n_pk,nc)", big, idxr)

# supernode-level: top_k over (n_pk, 78)
key78 = jax.device_put(jnp.asarray(rng.integers(-1, 1000, (n_pk, 78)), jnp.int32))
bench(jax.jit(lambda x: jnp.sum(lax.top_k(x, 16)[1])), "top_k k=16 over (n_pk,78)", key78)

# row gather of (128,6) cluster-bound blocks per (packet, snslot)
sn_ids = jax.device_put(jnp.asarray(rng.integers(0, 78, (n_pk, 16)), jnp.int32))
cl_bounds = jax.device_put(jnp.asarray(rng.random((78, 128, 6)), jnp.float32))
bench(jax.jit(lambda s, c: jnp.sum(c[s])), "gather (n_pk,16,128,6) sn blocks", sn_ids, cl_bounds)
