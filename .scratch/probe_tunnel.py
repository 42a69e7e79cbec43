import time
import numpy as np
import jax, jax.numpy as jnp

for mb in (1, 4, 16, 64):
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32) + 1.0
    _ = np.asarray(x)
    t0 = time.time(); reps = 5
    for _ in range(reps):
        _ = np.asarray(x * 1.0)
    dt = (time.time()-t0)/reps
    print(f"transfer {mb} MB: {dt*1e3:.1f} ms  ({mb/dt:.0f} MB/s)")

# dispatch RTT: tiny computation round trip
y = jnp.float32(1.0)
f = jax.jit(lambda a: a + 1)
_ = float(f(y))
t0 = time.time(); reps = 20
for _ in range(reps):
    _ = float(f(y))
print(f"tiny RTT: {(time.time()-t0)/reps*1e3:.1f} ms")
