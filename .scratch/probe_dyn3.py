import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_case(name, build):
    try:
        print(name, "->", build())
    except Exception as e:
        msg = str(e)
        for line in msg.splitlines():
            if "Mosaic" in line or "NotImplemented" in line or "INVALID" in line:
                print(name, "FAILED:", line[:120]); break
        else:
            print(name, "FAILED:", msg[:120])

# (a) (N,1) VMEM, dynamic sublane scalar read
def case_a():
    def kernel(tbl, idx, out):
        def body(i, acc):
            v = idx[0, i]
            return acc + tbl[v, 0]
        out[0, 0] = lax.fori_loop(0, 8, body, jnp.int32(0))
    tbl = jnp.asarray(np.arange(512, dtype=np.int32).reshape(512, 1))
    idx = jnp.asarray((np.arange(16, dtype=np.int32) * 37 % 512).reshape(1, 16))
    out = pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tbl, idx)
    want = sum(int((i * 37) % 512) for i in range(8))
    return f"got {int(out[0,0])} want {want}"

# (b) (M,8,128) VMEM, [v, s, 6] dynamic v,s
def case_b():
    def kernel(tbl, idx, out):
        def body(i, acc):
            v = idx[0, i]
            s = idx[0, i + 1] & 7
            return acc + tbl[v, s, 6]
        out[0, 0] = lax.fori_loop(0, 8, body, jnp.int32(0))
    t = np.zeros((64, 8, 128), np.int32); t[:, :, 6] = np.arange(64*8).reshape(64,8)
    tbl = jnp.asarray(t)
    idx = jnp.asarray((np.arange(16, dtype=np.int32) % 8).reshape(1, 16))
    out = pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tbl, idx)
    want = sum(int(np.arange(64*8).reshape(64,8)[i % 8, (i+1) % 8]) for i in range(8))
    return f"got {int(out[0,0])} want {want}"

# (c) SMEM input table (64,8), [v,s] dynamic
def case_c():
    def kernel(tbl, idx, out):
        def body(i, acc):
            v = idx[0, i]
            s = idx[0, i + 1] & 7
            return acc + tbl[v, s]
        out[0, 0] = lax.fori_loop(0, 8, body, jnp.int32(0))
    tbl = jnp.asarray(np.arange(64 * 8, dtype=np.int32).reshape(64, 8))
    idx = jnp.asarray((np.arange(16, dtype=np.int32) % 8).reshape(1, 16))
    out = pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tbl, idx)
    want = sum(int(np.arange(64*8).reshape(64,8)[i % 8, (i+1) % 8]) for i in range(8))
    return f"got {int(out[0,0])} want {want}"

try_case("a (N,1) vmem dyn-sublane", case_a)
try_case("b (M,8,128) vmem dyn v,s", case_b)
try_case("c smem table dyn v,s", case_c)
