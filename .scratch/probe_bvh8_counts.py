"""Instrumented BVH8 traversal: count pops + leaf visits per packet."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rust_raytracer_tpu.ops.pallas_bvh8 import (CLUSTER, TILE, TILES_PER_BLOCK, STACK, DET_EPS, BIG, T_MIN_STATIC)

def _kernel(aabb8, child8, ox, oy, oz, dx, dy, dz, tmax_ref, tri_ref,
            t_out, i_out, pops_out, leaves_out):
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
            def cond(c): return c[0] > 0
            def body(c):
                sp, pops, leaves = c
                sp1 = sp - 1
                v = stack_ref[sp1]
                def leaf_fn(sp1):
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
                    for cc in range(7, -1, -1):
                        child = child8[v, cc]
                        push = (lax.shift_right_logical(bits, jnp.int32(cc)) & 1) > 0
                        push &= child != 0
                        @pl.when(push)
                        def _(off=off, child=child):
                            stack_ref[sp1 + off] = child
                        off = off + push.astype(jnp.int32)
                    return sp1 + off
                is_leaf = v < 0
                nsp = lax.cond(is_leaf, leaf_fn, internal_fn, sp1)
                return (nsp, pops + 1, leaves + is_leaf.astype(jnp.int32))
            _, pops, leaves = lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0), jnp.int32(0)))
            t_out[pl.ds(j,1), :] = best_t[:, :].reshape(1, TILE)
            i_out[pl.ds(j,1), :] = best_i[:, :].reshape(1, TILE)
            pops_out[pl.ds(j,1), :] = jnp.full((1, TILE), pops, jnp.int32)
            leaves_out[pl.ds(j,1), :] = jnp.full((1, TILE), leaves, jnp.int32)
            return 0
        lax.fori_loop(0, ox.shape[0], packet, 0)
    pl.run_scoped(run,
        stack_ref=pltpu.SMEM((STACK,), jnp.int32),
        best_t=pltpu.VMEM((TILE,1), jnp.float32),
        best_i=pltpu.VMEM((TILE,1), jnp.int32),
        best_t_row=pltpu.VMEM((8,TILE), jnp.float32))

@jax.jit
def traverse(aabb8, child8, tri_geom, org, dirn, t_max):
    n = org.shape[0]; n_tiles = n // TILE
    bt = min(TILES_PER_BLOCK, n_tiles)
    rows = lambda a: a.reshape(n_tiles, TILE)
    args = [rows(org[:,0]), rows(org[:,1]), rows(org[:,2]),
            rows(dirn[:,0]), rows(dirn[:,1]), rows(dirn[:,2]), rows(t_max)]
    spec = pl.BlockSpec((bt, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(n_tiles//bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2 + [spec]*7 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[spec]*4,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127*1024*1024),
    )(aabb8, child8, *args, tri_geom)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
scene = models.build("cornell_dragon")
pack, _ = sc.compile_scene(scene)
N = 1 << 17
rng = np.random.default_rng(0)
t_max = jnp.full((N,), np.inf, jnp.float32)

def probe(org, dirn, label):
    t, i, p, l = traverse(pack.bvh8_aabb, pack.bvh8_child, pack.tri_geom,
                          jnp.asarray(org), jnp.asarray(dirn), t_max)
    p = np.asarray(p)[:,0].astype(np.float64); l = np.asarray(l)[:,0].astype(np.float64)
    print(f"{label}: pops/packet {p.mean():.0f}  leaves/packet {l.mean():.0f}  internal {p.mean()-l.mean():.0f}")

org = np.tile(np.array([278,278,-800], np.float32), (N,1))
px = rng.uniform(0,555,(N,)); py = rng.uniform(0,555,(N,))
dirn = np.stack([px-278, py-278, np.full((N,),800.0)],-1).astype(np.float32)
k = np.lexsort((py//4, px//4))
probe(org[k], dirn[k], "coh-sorted")
org2 = rng.uniform(0,555,(N,3)).astype(np.float32)
dirn2 = rng.normal(size=(N,3)).astype(np.float32)
from rust_raytracer_tpu.render.integrator import _compaction_key
key = np.asarray(_compaction_key(jnp.asarray(org2), jnp.asarray(dirn2), jnp.ones((N,), bool)))
k2 = np.argsort(key)
probe(org2[k2], dirn2[k2], "incoh-sorted")
# per-ray need: single-ray packets would be ideal; estimate via tiny TILE? skip.

# real steady-state wavefront (pool order = already compaction-sorted)
d = np.load("/root/repo/.scratch/steady_state.npz")
org3 = jnp.asarray(d["org"]); dirn3 = jnp.asarray(d["dirn"]); alive3 = jnp.asarray(d["alive"])
t_max = jnp.where(alive3, np.float32(3.4e38), 0.0).astype(jnp.float32)
N = org3.shape[0]
t, i, p, l = traverse(pack.bvh8_aabb, pack.bvh8_child, pack.tri_geom, org3, dirn3, t_max)
p = np.asarray(p)[:,0].astype(np.float64); l = np.asarray(l)[:,0].astype(np.float64)
print(f"steady-state: pops/packet {p.mean():.0f}  leaves/packet {l.mean():.0f}  internal {p.mean()-l.mean():.0f}  total pops {p.sum():.0f} leaves {l.sum():.0f}")

# timing of the instrumented kernel itself on the steady-state wavefront
import time as _time
def _bench(f, label, reps=3):
    o = jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
    t0 = _time.time()
    for _ in range(reps):
        o = f()
    jax.block_until_ready(jax.tree_util.tree_leaves(f())[0])
    print(f"{label}: {( _time.time()-t0)/reps*1e3:.1f} ms", flush=True)
_bench(lambda: traverse(pack.bvh8_aabb, pack.bvh8_child, pack.tri_geom, org3, dirn3, t_max),
       "instrumented kernel steady-state")
from rust_raytracer_tpu.ops import pallas_bvh8 as _pb8
_prod = jax.jit(lambda o, dd, tm: _pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))
_bench(lambda: _prod(org3, dirn3, t_max), "production kernel steady-state")
