import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

n_pk, nc, k = 32768, 9918, 128
rng = np.random.default_rng(0)
mask = rng.random((n_pk, nc)) < 33.0 / nc
tent = np.where(mask, rng.random((n_pk, nc)).astype(np.float32) * 10 + 1e-3, np.inf)
key = np.where(mask, 0x7FFFFFFF - tent.astype(np.float32).view(np.int32), -1).astype(np.int32)
key_d = jax.device_put(jnp.asarray(key))

def bench(f, label, *args, reps=5):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps):
        o = f(*args)
        jax.block_until_ready(o)
    dt = (time.time()-t0)/reps*1e3
    print(f"{label:44s} {dt:8.2f} ms   check={o}", flush=True)

# force real work: reduce the top_k output to a scalar inside the jit
bench(jax.jit(lambda x: jnp.sum(lax.top_k(x, k)[1] % 97)), f"top_k k={k} (sum idx)", key_d)
bench(jax.jit(lambda x: jnp.sum(lax.top_k(x, 64)[1] % 97)), "top_k k=64 (sum idx)", key_d)
bench(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int64)), "plain row sum (BW floor)", key_d)

@jax.jit
def cumsum_extract(m):
    cs = jnp.cumsum(m, axis=1)
    return jnp.sum(cs[:, -1])
bench(cumsum_extract, "cumsum only", (key_d >= 0).astype(jnp.int32))
