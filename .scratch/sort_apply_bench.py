"""Pool compaction: argsort+index-gathers vs multi-operand lax.sort."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 1 << 18
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64).astype(np.uint32))
f3 = [jnp.asarray(rng.random((N, 3), np.float32)) for _ in range(4)]
u1 = [jnp.asarray(rng.integers(0, 1000, N).astype(np.uint32)) for _ in range(3)]
b1 = jnp.asarray(rng.random(N) < 0.5)

def bench(f, label, *args, reps=5):
    o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(reps):
        o = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    print(f"RESULT {label:44s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)

@jax.jit
def via_gather(key, f3, u1, b1):
    perm = jnp.argsort(key)
    return [a[perm] for a in f3] + [a[perm] for a in u1] + [b1[perm]]

@jax.jit
def via_sort(key, f3, u1, b1):
    ops = [key]
    for a in f3:
        ops += [a[:, 0], a[:, 1], a[:, 2]]
    ops += list(u1) + [b1.astype(jnp.uint8)]
    out = lax.sort(tuple(ops), dimension=0, num_keys=1)
    return out[1:]

@jax.jit
def via_gather_packed(key, f3, u1, b1):
    perm = jnp.argsort(key)
    packed = jnp.concatenate(f3 + [a[:, None].astype(jnp.float32) for a in u1]
                             + [b1[:, None].astype(jnp.float32)], axis=1)
    return packed[perm]

bench(via_gather, "argsort + 8 per-array gathers", key, f3, u1, b1)
bench(via_sort, "multi-operand lax.sort (17 ops)", key, f3, u1, b1)
bench(via_gather_packed, "argsort + packed (N,16) gather", key, f3, u1, b1)
