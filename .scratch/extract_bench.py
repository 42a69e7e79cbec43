"""Extraction alternatives for the (n_pk, nc) key matrix."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

n_pk, nc, k = 32768, 9918, 128
rng = np.random.default_rng(0)
# realistic sparsity: ~33 hits/row, clustered
mask = rng.random((n_pk, nc)) < 33.0 / nc
tent = np.where(mask, rng.random((n_pk, nc)).astype(np.float32) * 10 + 1e-3, np.inf)
key = np.where(mask, 0x7FFFFFFF - tent.astype(np.float32).view(np.int32), -1).astype(np.int32)
key_d = jnp.asarray(key)
mask_d = jnp.asarray(mask)

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps): o = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"{label:44s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
    return o

bench(jax.jit(lambda x: lax.top_k(x, k)), f"lax.top_k k={k}", key_d)
bench(jax.jit(lambda x: lax.top_k(x, 64)), "lax.top_k k=64", key_d)
bench(jax.jit(lambda x: lax.approx_max_k(x.astype(jnp.float32), k)),
      "approx_max_k k=128 (f32 of int keys)", key_d)
bench(jax.jit(lambda x: lax.approx_max_k(x.astype(jnp.float32), k,
                                         recall_target=0.99)),
      "approx_max_k k=128 recall .99", key_d)

@jax.jit
def cumsum_extract(m):
    cs = jnp.cumsum(m.astype(jnp.int32), axis=1)            # (P, nc)
    total = cs[:, -1]
    q = jnp.arange(1, k + 1, dtype=jnp.int32)[None, :]      # (1, k)
    # index of the q-th set bit: first position where cs >= q
    idx = jax.vmap(lambda c, qq: jnp.searchsorted(c, qq, side="left"))(cs, jnp.broadcast_to(q, (m.shape[0], k)))
    valid = q <= total[:, None]
    return jnp.where(valid, idx, 0), jnp.minimum(total, k)

bench(cumsum_extract, "cumsum + searchsorted k=128", mask_d)

# sort-based: sort keys descending per row, take first k
bench(jax.jit(lambda x: lax.sort(x, dimension=1)), "full row sort", key_d)
