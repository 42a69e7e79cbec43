import functools, time
import numpy as np
import jax, jax.numpy as jnp
exec(open('.scratch/probe_mt2.py').read().split('def probe_mt')[0])

def probe(C, n_iter, n_blocks, reps=3):
    rng = np.random.default_rng(0)
    tris = jnp.asarray(rng.normal(size=(n_iter, 9, C)).astype(np.float32))
    rays = [jnp.asarray(rng.normal(size=(n_blocks*8, TILE)).astype(np.float32)) for _ in range(6)]
    spec = pl.BlockSpec((8, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(mt_kernel, n_iter=n_iter, C=C),
        grid=(n_blocks,),
        in_specs=[spec]*6 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks*8, TILE), jnp.float32),
    )
    jf = jax.jit(lambda *a: f(*a))
    _ = np.asarray(jf(*rays, tris))
    t0 = time.time()
    for _ in range(reps):
        out = np.asarray(jf(*rays, tris))
    dt = (time.time()-t0)/reps
    pairs = n_blocks*8*TILE*n_iter*C
    print(f"C={C} it={n_iter} bl={n_blocks}: {dt*1e3:.2f} ms  {pairs/dt/1e9:.1f} Gpairs/s  {pairs*58/dt/1e12:.2f} TF")

probe(C=256, n_iter=64, n_blocks=64)
probe(C=256, n_iter=64, n_blocks=512)
probe(C=256, n_iter=256, n_blocks=512)
