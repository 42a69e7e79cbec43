import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(tbl, idx, out):
    def body(i, acc):
        v = idx[0, i]          # scalar
        s = idx[0, i + 1] & 7
        return acc + tbl[v, s]  # dynamic-dynamic scalar read
    acc = lax.fori_loop(0, 8, body, jnp.int32(0))
    out[0, 0] = acc

tbl = jnp.asarray(np.arange(64 * 8, dtype=np.int32).reshape(64, 8))
idx = jnp.asarray(np.arange(16, dtype=np.int32).reshape(1, 16) % 8)
out = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
)(tbl, idx)
ref = sum(int(np.arange(64*8).reshape(64,8)[i % 8, (i+1) % 8]) for i in range(0, 8))
print("got", int(out[0,0]), "want", ref)
