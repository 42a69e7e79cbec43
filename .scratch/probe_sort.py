import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

B = 1 << 18
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 2**32, (B,), dtype=np.uint32))
vals = [jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32)) for _ in range(3)]

def timeit(f, label, *a, reps=5):
    t0 = time.time(); _ = np.asarray(f(*a)); comp = time.time()-t0
    t0 = time.time()
    for _ in range(reps): r = np.asarray(f(*a))
    dt = (time.time()-t0)/reps - 0.025
    print(f"{label}: compile {comp:.1f}s  run {dt*1e3:.1f} ms")

@jax.jit
def just_argsort(key):
    return jnp.sum(jnp.argsort(key))
timeit(just_argsort, "argsort(256k u32)", key)

@jax.jit
def argsort_gather(key, a, b, c):
    p = jnp.argsort(key)
    return jnp.sum(a[p]) + jnp.sum(b[p]) + jnp.sum(c[p]) + jnp.sum(p)
timeit(argsort_gather, "argsort+3 gathers", key, *vals)

@jax.jit
def gathers_only(key, a, b, c):
    p = (key % B).astype(jnp.int32)
    return jnp.sum(a[p]) + jnp.sum(b[p]) + jnp.sum(c[p])
timeit(gathers_only, "3 gathers only", key, *vals)

# lax.sort multi-operand (sort key + payloads directly, no gather)
@jax.jit
def laxsort(key, a, b, c):
    ks, a2, b2, c2 = lax.sort((key, a, b, c), dimension=0, num_keys=1)
    return jnp.sum(a2) + jnp.sum(b2) + jnp.sum(c2)
timeit(laxsort, "lax.sort key+3 payloads", key, *vals)
