"""Probe: (1) VMEM capacity, (2) dense MT VPU throughput, (3) DMA latency."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_vmem(mb):
    n = mb * 1024 * 1024 // 4 // 128  # rows of 128 f32
    def kernel(x_ref, o_ref):
        def run(scratch):
            scratch[0:8, :] = x_ref[:]
            o_ref[:] = scratch[0:8, :] * 2.0
        pl.run_scoped(run, scratch=pltpu.VMEM((n, 128), jnp.float32))
    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        out.block_until_ready()
        return True
    except Exception as e:
        return False


for mb in ():
    ok = probe_vmem(mb)
    print(f"VMEM scratch {mb} MB: {'OK' if ok else 'FAIL'}")
    if not ok:
        break

# ---- dense Möller-Trumbore throughput: rays (TILE,1) x tris (1,C) ----
TILE = 128


def mt_kernel(ox, oy, oz, dx, dy, dz, tris, t_out, *, n_iter, C):
    """Each grid step: 8 packets of TILE rays vs n_iter*C triangles, all VMEM."""
    def packet(j, _):
        def col(ref):
            return ref[pl.ds(j, 1), :].reshape(TILE, 1)
        o_x, o_y, o_z = col(ox), col(oy), col(oz)
        d_x, d_y, d_z = col(dx), col(dy), col(dz)
        best0 = jnp.full((TILE, 1), 3.4e38, jnp.float32)

        def body(k, best):
            v0x = tris[k, 0:1, :]
            v0y = tris[k, 1:2, :]
            v0z = tris[k, 2:3, :]
            e1x = tris[k, 3:4, :]
            e1y = tris[k, 4:5, :]
            e1z = tris[k, 5:6, :]
            e2x = tris[k, 6:7, :]
            e2y = tris[k, 7:8, :]
            e2z = tris[k, 8:9, :]
            px = d_y * e2z - d_z * e2y
            py = d_z * e2x - d_x * e2z
            pz = d_x * e2y - d_y * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
            bx = o_x - v0x
            by = o_y - v0y
            bz = o_z - v0z
            u = (bx * px + by * py + bz * pz) * inv_det
            qx = by * e1z - bz * e1y
            qy = bz * e1x - bx * e1z
            qz = bx * e1y - by * e1x
            v = (d_x * qx + d_y * qy + d_z * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (det > 1e-12) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (t > 1e-3) & (t < best)
            tt = jnp.where(ok, t, 3.4e38)
            return jnp.minimum(best, jnp.min(tt, axis=1, keepdims=True))

        best = lax.fori_loop(0, n_iter, body, best0)
        t_out[pl.ds(j, 1), :] = best.reshape(1, TILE)
        return 0

    lax.fori_loop(0, 8, packet, 0)


def probe_mt(C, n_iter, n_blocks):
    rng = np.random.default_rng(0)
    tris = jnp.asarray(rng.normal(size=(n_iter, 9, C)).astype(np.float32))
    rays = [jnp.asarray(rng.normal(size=(n_blocks * 8, TILE)).astype(np.float32)) for _ in range(6)]
    spec = pl.BlockSpec((8, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(mt_kernel, n_iter=n_iter, C=C),
        grid=(n_blocks,),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, TILE), jnp.float32),
    )
    jf = jax.jit(lambda *a: f(*a))
    out = jf(*rays, tris); out.block_until_ready()
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = jf(*rays, tris)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    pairs = n_blocks * 8 * TILE * n_iter * C
    flops = pairs * 58
    print(f"dense MT C={C} iters={n_iter} blocks={n_blocks}: {dt*1e3:.2f} ms  "
          f"{pairs/dt/1e9:.2f} Gpairs/s  {flops/dt/1e12:.2f} TFLOP/s")


probe_mt(C=256, n_iter=32, n_blocks=32)
probe_mt(C=128, n_iter=64, n_blocks=32)
probe_mt(C=512, n_iter=16, n_blocks=32)
probe_mt(C=1024, n_iter=8, n_blocks=32)

# ---- DMA latency: serialized small copies HBM->VMEM ----
def dma_kernel(src, o_ref, *, n_iter, rows, C):
    def run(buf, sem, acc):
        acc[:, :] = jnp.zeros((8, 128), jnp.float32)

        def body(k, _):
            dma = pltpu.make_async_copy(src.at[k], buf, sem)
            dma.start()
            dma.wait()
            cc = min(C, 128)
            acc[:, 0:cc] = acc[:, 0:cc] + buf[0:8, 0:cc]
            return 0

        lax.fori_loop(0, n_iter, body, 0)
        o_ref[:] = acc[:, :]

    pl.run_scoped(
        run,
        buf=pltpu.VMEM((rows, C), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        acc=pltpu.VMEM((8, 128), jnp.float32),
    )


def probe_dma(rows, C, n_iter=2048):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(n_iter, rows, C)).astype(np.float32))
    f = pl.pallas_call(
        functools.partial(dma_kernel, n_iter=n_iter, rows=rows, C=C),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    jf = jax.jit(f)
    out = jf(src); out.block_until_ready()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = jf(src)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    bytes_each = rows * C * 4
    print(f"serialized DMA {bytes_each/1024:.0f} KB x{n_iter}: {dt/n_iter*1e6:.2f} us/copy  "
          f"{bytes_each*n_iter/dt/1e9:.1f} GB/s")


probe_dma(16, 256)   # 16 KB (current leaf size)
probe_dma(16, 64)    # 4 KB
probe_dma(64, 256)   # 64 KB
