"""Cost split: run the BVH8 kernel with (a) full, (b) leaf MT disabled
(traversal still walks the same nodes, best_t never updates -> MORE nodes
visited than full, so this overstates internal cost slightly)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rust_raytracer_tpu.ops.pallas_bvh8 import (CLUSTER, TILE, TILES_PER_BLOCK, STACK, DET_EPS, BIG, T_MIN_STATIC)

def make_kernel(do_leaf):
    def _kernel(aabb8, ox, oy, oz, dx, dy, dz, tmax_ref, tri_ref, t_out, i_out):
        pow2 = jnp.left_shift(jnp.int32(1), lax.broadcasted_iota(jnp.int32, (8, 1), 0))
        def run(stack_ref, best_t, best_i, best_t_row):
            def packet(j, _):
                o_xr = ox[pl.ds(j,1), :]; o_yr = oy[pl.ds(j,1), :]; o_zr = oz[pl.ds(j,1), :]
                d_xr = dx[pl.ds(j,1), :]; d_yr = dy[pl.ds(j,1), :]; d_zr = dz[pl.ds(j,1), :]
                inv_xr, inv_yr, inv_zr = 1.0/d_xr, 1.0/d_yr, 1.0/d_zr
                o_xc = o_xr.reshape(TILE,1); o_yc = o_yr.reshape(TILE,1); o_zc = o_zr.reshape(TILE,1)
                d_xc = d_xr.reshape(TILE,1); d_yc = d_yr.reshape(TILE,1); d_zc = d_zr.reshape(TILE,1)
                t0 = jnp.minimum(tmax_ref[pl.ds(j,1), :], BIG)
                best_t[:, :] = t0.reshape(TILE,1); best_t_row[0:1,:] = t0
                best_i[:, :] = jnp.full((TILE,1), -1, jnp.int32)
                stack_ref[0] = jnp.int32(0)
                def cond(sp): return sp > 0
                def body(sp):
                    sp1 = sp - 1
                    v = stack_ref[sp1]
                    def leaf_fn(sp1):
                        if do_leaf:
                            cluster = -v - 1
                            v0x, v0y, v0z = tri_ref[cluster,0:1,:], tri_ref[cluster,1:2,:], tri_ref[cluster,2:3,:]
                            e1x, e1y, e1z = tri_ref[cluster,3:4,:], tri_ref[cluster,4:5,:], tri_ref[cluster,5:6,:]
                            e2x, e2y, e2z = tri_ref[cluster,6:7,:], tri_ref[cluster,7:8,:], tri_ref[cluster,8:9,:]
                            back = tri_ref[cluster,9:10,:]
                            px = d_yc*e2z - d_zc*e2y; py = d_zc*e2x - d_xc*e2z; pz = d_xc*e2y - d_yc*e2x
                            det = e1x*px + e1y*py + e1z*pz
                            dd = jnp.where(back > 0.5, jnp.abs(det), det)
                            ok = dd > DET_EPS
                            inv_det = 1.0/jnp.where(det == 0.0, 1.0, det)
                            bx, by, bz = o_xc - v0x, o_yc - v0y, o_zc - v0z
                            u = (bx*px + by*py + bz*pz)*inv_det
                            qx = by*e1z - bz*e1y; qy = bz*e1x - bx*e1z; qz = bx*e1y - by*e1x
                            w = (d_xc*qx + d_yc*qy + d_zc*qz)*inv_det
                            t = (e2x*qx + e2y*qy + e2z*qz)*inv_det
                            ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0) & (u + w <= 1.0)
                            bt = best_t[:, :]
                            ok &= (t > T_MIN_STATIC) & (t < bt)
                            tt = jnp.where(ok, t, BIG)
                            new_t = jnp.min(tt, axis=1, keepdims=True)
                            new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                            better = new_t < bt
                            best_i[:, :] = jnp.where(better, cluster*CLUSTER + new_i, best_i[:, :])
                            nt = jnp.where(better, new_t, bt)
                            best_t[:, :] = nt
                            best_t_row[0:1, :] = nt.reshape(1, TILE)
                        return sp1
                    def internal_fn(sp1):
                        lo_x, lo_y, lo_z = aabb8[v,:,0:1], aabb8[v,:,1:2], aabb8[v,:,2:3]
                        hi_x, hi_y, hi_z = aabb8[v,:,3:4], aabb8[v,:,4:5], aabb8[v,:,5:6]
                        tx0 = (lo_x - o_xr)*inv_xr; tx1 = (hi_x - o_xr)*inv_xr
                        ty0 = (lo_y - o_yr)*inv_yr; ty1 = (hi_y - o_yr)*inv_yr
                        tz0 = (lo_z - o_zr)*inv_zr; tz1 = (hi_z - o_zr)*inv_zr
                        near = jnp.maximum(jnp.maximum(jnp.minimum(tx0,tx1), jnp.minimum(ty0,ty1)), jnp.minimum(tz0,tz1))
                        far = jnp.minimum(jnp.minimum(jnp.maximum(tx0,tx1), jnp.maximum(ty0,ty1)),
                                          jnp.minimum(jnp.maximum(tz0,tz1), best_t_row[0:1,:]))
                        anyc = jnp.any(near <= far, axis=1, keepdims=True)
                        bits = jnp.sum(jnp.where(anyc, pow2, 0))
                        off = jnp.int32(0)
                        for c in range(7, -1, -1):
                            child = aabb8[v, c, 6].astype(jnp.int32)
                            push = (lax.shift_right_logical(bits, jnp.int32(c)) & 1) > 0
                            push &= child != 0
                            @pl.when(push)
                            def _(off=off, child=child):
                                stack_ref[sp1 + off] = child
                            off = off + push.astype(jnp.int32)
                        return sp1 + off
                    return lax.cond(v < 0, leaf_fn, internal_fn, sp1)
                lax.while_loop(cond, body, jnp.int32(1))
                t_out[pl.ds(j,1), :] = best_t[:, :].reshape(1, TILE)
                i_out[pl.ds(j,1), :] = best_i[:, :].reshape(1, TILE)
                return 0
            lax.fori_loop(0, ox.shape[0], packet, 0)
        pl.run_scoped(run,
            stack_ref=pltpu.SMEM((STACK,), jnp.int32),
            best_t=pltpu.VMEM((TILE,1), jnp.float32),
            best_i=pltpu.VMEM((TILE,1), jnp.int32),
            best_t_row=pltpu.VMEM((8,TILE), jnp.float32))
    return _kernel

def make_traverse(do_leaf):
    kern = make_kernel(do_leaf)
    @jax.jit
    def traverse(aabb8, tri_geom, org, dirn, t_max):
        n = org.shape[0]; n_tiles = n // TILE
        bt = min(TILES_PER_BLOCK, n_tiles)
        rows = lambda a: a.reshape(n_tiles, TILE)
        args = [rows(org[:,0]), rows(org[:,1]), rows(org[:,2]),
                rows(dirn[:,0]), rows(dirn[:,1]), rows(dirn[:,2]), rows(t_max)]
        spec = pl.BlockSpec((bt, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        t, i = pl.pallas_call(kern, grid=(n_tiles//bt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec]*7 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[spec]*2,
            out_shape=[jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
                       jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127*1024*1024),
        )(aabb8, *args, tri_geom)
        return jnp.sum(t) + jnp.sum(i)
    return traverse

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render.integrator import _compaction_key
scene = models.build("cornell_dragon")
pack, _ = sc.compile_scene(scene)
N = 1 << 17
rng = np.random.default_rng(0)
t_max = jnp.full((N,), np.inf, jnp.float32)
org2 = rng.uniform(0,555,(N,3)).astype(np.float32)
dirn2 = rng.normal(size=(N,3)).astype(np.float32)
key = np.asarray(_compaction_key(jnp.asarray(org2), jnp.asarray(dirn2), jnp.ones((N,), bool)))
k2 = np.argsort(key)
o = jnp.asarray(org2[k2]); d = jnp.asarray(dirn2[k2])

for label, do_leaf in (("full", True), ("no-leaf-MT", False)):
    f = make_traverse(do_leaf)
    _ = np.asarray(f(pack.bvh8_aabb, pack.tri_geom, o, d, t_max))
    t0 = time.time(); reps = 3
    for _ in range(reps): r = np.asarray(f(pack.bvh8_aabb, pack.tri_geom, o, d, t_max))
    dt = (time.time()-t0)/reps - 0.025
    print(f"{label}: {dt*1e3:.0f} ms")
