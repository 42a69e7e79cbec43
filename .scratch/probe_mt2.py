import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
TILE = 128

def mt_kernel(ox, oy, oz, dx, dy, dz, tris, t_out, *, n_iter, C):
    def packet(j, _):
        def col(ref):
            return ref[pl.ds(j, 1), :].reshape(TILE, 1)
        o_x, o_y, o_z = col(ox), col(oy), col(oz)
        d_x, d_y, d_z = col(dx), col(dy), col(dz)
        best0 = jnp.full((TILE, 1), 3.4e38, jnp.float32)
        def body(k, best):
            v0x, v0y, v0z = tris[k,0:1,:], tris[k,1:2,:], tris[k,2:3,:]
            e1x, e1y, e1z = tris[k,3:4,:], tris[k,4:5,:], tris[k,5:6,:]
            e2x, e2y, e2z = tris[k,6:7,:], tris[k,7:8,:], tris[k,8:9,:]
            px = d_y*e2z - d_z*e2y; py = d_z*e2x - d_x*e2z; pz = d_x*e2y - d_y*e2x
            det = e1x*px + e1y*py + e1z*pz
            inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
            bx, by, bz = o_x - v0x, o_y - v0y, o_z - v0z
            u = (bx*px + by*py + bz*pz) * inv_det
            qx = by*e1z - bz*e1y; qy = bz*e1x - bx*e1z; qz = bx*e1y - by*e1x
            v = (d_x*qx + d_y*qy + d_z*qz) * inv_det
            t = (e2x*qx + e2y*qy + e2z*qz) * inv_det
            ok = (det > 1e-12) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (t > 1e-3) & (t < best)
            tt = jnp.where(ok, t, 3.4e38)
            return jnp.minimum(best, jnp.min(tt, axis=1, keepdims=True))
        best = lax.fori_loop(0, n_iter, body, best0)
        t_out[pl.ds(j, 1), :] = best.reshape(1, TILE)
        return 0
    lax.fori_loop(0, 8, packet, 0)

def probe_mt(C, n_iter, n_blocks, check=False):
    rng = np.random.default_rng(0)
    tris_np = rng.normal(size=(n_iter, 9, C)).astype(np.float32)
    rays_np = [rng.normal(size=(n_blocks*8, TILE)).astype(np.float32) for _ in range(6)]
    tris = jnp.asarray(tris_np); rays = [jnp.asarray(r) for r in rays_np]
    spec = pl.BlockSpec((8, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(mt_kernel, n_iter=n_iter, C=C),
        grid=(n_blocks,),
        in_specs=[spec]*6 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks*8, TILE), jnp.float32),
    )
    jf = jax.jit(lambda *a: f(*a))
    out = jf(*rays, tris); out.block_until_ready()
    t0 = time.time(); reps = 10
    for _ in range(reps):
        out = jf(*rays, tris)
    out.block_until_ready()
    dt = (time.time()-t0)/reps
    pairs = n_blocks*8*TILE*n_iter*C
    print(f"C={C} iters={n_iter} blocks={n_blocks}: {dt*1e3:.2f} ms  {pairs/dt/1e9:.1f} Gpairs/s  {pairs*58/dt/1e12:.2f} TFLOP/s")
    if check:
        # numpy oracle on packet 0
        o = np.stack([rays_np[i][0] for i in range(3)], -1)  # (128,3)
        d = np.stack([rays_np[i][0] for i in range(3,6)], -1)
        best = np.full((TILE,), 3.4e38, np.float32)
        for k in range(n_iter):
            v0 = tris_np[k,0:3].T; e1 = tris_np[k,3:6].T; e2 = tris_np[k,6:9].T
            p = np.cross(d[:,None,:], e2[None,:,:])
            det = np.sum(e1[None]*p, -1)
            inv = 1.0/np.where(det==0,1,det)
            b = o[:,None,:]-v0[None]
            u = np.sum(b*p,-1)*inv
            q = np.cross(b, e1[None])
            v = np.sum(d[:,None,:]*q,-1)*inv
            t = np.sum(e2[None]*q,-1)*inv
            ok = (det>1e-12)&(u>=0)&(u<=1)&(v>=0)&(u+v<=1)&(t>1e-3)&(t<best[:,None])
            tt = np.where(ok, t, 3.4e38).min(1)
            best = np.minimum(best, tt)
        got = np.asarray(out)[0]
        print("  check max rel err:", float(np.max(np.abs(got-best)/np.maximum(np.abs(best),1e-6))))

probe_mt(C=256, n_iter=64, n_blocks=512, check=True)   # 8.6 G pairs
probe_mt(C=256, n_iter=256, n_blocks=512)               # 34 G pairs
