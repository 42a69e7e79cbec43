"""Probe: count node steps + leaf visits per packet (instrumented copy of
the pallas traversal)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rust_raytracer_tpu.ops.pallas_intersect import (
    CLUSTER, TILE, TILES_PER_BLOCK, GEOM_ROWS, DET_EPS, BIG, T_MIN_STATIC)

def _kernel(nodes_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
            tri_hbm, t_out, i_out, steps_out, leaves_out, *, n_nodes):
    def run(buf, sem, best_t_ref, best_i_ref):
        def col(ref, j):
            return ref[pl.ds(j, 1), :].reshape(TILE, 1)
        def packet(j, _):
            o_x, o_y, o_z = col(ox, j), col(oy, j), col(oz, j)
            d_x, d_y, d_z = col(dx, j), col(dy, j), col(dz, j)
            inv_x, inv_y, inv_z = 1.0/d_x, 1.0/d_y, 1.0/d_z
            best_t_ref[:, :] = jnp.minimum(col(tmax_ref, j), BIG)
            best_i_ref[:, :] = jnp.full((TILE, 1), -1, jnp.int32)
            def cond(c):
                return c[0] < n_nodes
            def body(c):
                node, steps, leaves = c
                lo_x, lo_y, lo_z = nodes_ref[node,0], nodes_ref[node,1], nodes_ref[node,2]
                hi_x, hi_y, hi_z = nodes_ref[node,3], nodes_ref[node,4], nodes_ref[node,5]
                best_t = best_t_ref[:, :]
                tx0 = (lo_x - o_x) * inv_x; tx1 = (hi_x - o_x) * inv_x
                ty0 = (lo_y - o_y) * inv_y; ty1 = (hi_y - o_y) * inv_y
                tz0 = (lo_z - o_z) * inv_z; tz1 = (hi_z - o_z) * inv_z
                near = jnp.maximum(jnp.maximum(jnp.minimum(tx0,tx1), jnp.minimum(ty0,ty1)), jnp.minimum(tz0,tz1))
                far = jnp.minimum(jnp.minimum(jnp.maximum(tx0,tx1), jnp.maximum(ty0,ty1)), jnp.minimum(jnp.maximum(tz0,tz1), best_t))
                any_hit = jnp.any(near <= far)
                leaf_p1 = nodes_ref[node, 8].astype(jnp.int32)
                is_leaf = any_hit & (leaf_p1 > 0)
                @pl.when(is_leaf)
                def _():
                    cluster = leaf_p1 - 1
                    dma = pltpu.make_async_copy(tri_hbm.at[cluster], buf, sem)
                    dma.start(); dma.wait()
                    v0x, v0y, v0z = buf[0:1,:], buf[1:2,:], buf[2:3,:]
                    e1x, e1y, e1z = buf[3:4,:], buf[4:5,:], buf[5:6,:]
                    e2x, e2y, e2z = buf[6:7,:], buf[7:8,:], buf[8:9,:]
                    back = buf[9:10,:]
                    px_ = d_y*e2z - d_z*e2y; py_ = d_z*e2x - d_x*e2z; pz_ = d_x*e2y - d_y*e2x
                    det = e1x*px_ + e1y*py_ + e1z*pz_
                    dd = jnp.where(back > 0.5, jnp.abs(det), det)
                    ok = dd > DET_EPS
                    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                    bx, by, bz = o_x - v0x, o_y - v0y, o_z - v0z
                    u = (bx*px_ + by*py_ + bz*pz_) * inv_det
                    qx = by*e1z - bz*e1y; qy = bz*e1x - bx*e1z; qz = bx*e1y - by*e1x
                    v = (d_x*qx + d_y*qy + d_z*qz) * inv_det
                    t = (e2x*qx + e2y*qy + e2z*qz) * inv_det
                    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                    best_t2 = best_t_ref[:, :]
                    ok &= (t > T_MIN_STATIC) & (t < best_t2)
                    tt = jnp.where(ok, t, BIG)
                    new_t = jnp.min(tt, axis=1, keepdims=True)
                    new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                    better = new_t < best_t2
                    best_i_ref[:, :] = jnp.where(better, cluster*CLUSTER + new_i, best_i_ref[:, :])
                    best_t_ref[:, :] = jnp.where(better, new_t, best_t2)
                hit_link = nodes_ref[node, 6].astype(jnp.int32)
                miss_link = nodes_ref[node, 7].astype(jnp.int32)
                return (jnp.where(any_hit, hit_link, miss_link), steps + 1,
                        leaves + is_leaf.astype(jnp.int32))
            _, steps, leaves = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            t_out[pl.ds(j, 1), :] = best_t_ref[:, :].reshape(1, TILE)
            i_out[pl.ds(j, 1), :] = best_i_ref[:, :].reshape(1, TILE)
            steps_out[pl.ds(j, 1), :] = jnp.full((1, TILE), steps, jnp.int32)
            leaves_out[pl.ds(j, 1), :] = jnp.full((1, TILE), leaves, jnp.int32)
            return 0
        lax.fori_loop(0, ox.shape[0], packet, 0)
    pl.run_scoped(run,
        buf=pltpu.VMEM((GEOM_ROWS, CLUSTER), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        best_t_ref=pltpu.VMEM((TILE, 1), jnp.float32),
        best_i_ref=pltpu.VMEM((TILE, 1), jnp.int32))

@functools.partial(jax.jit, static_argnames=("n_nodes",))
def traverse(nodes_rows, tri_geom, org, dirn, t_max, *, n_nodes):
    n = org.shape[0]; n_tiles = n // TILE
    bt = min(TILES_PER_BLOCK, n_tiles)
    rows = lambda a: a.reshape(n_tiles, TILE)
    args = [rows(org[:,0]), rows(org[:,1]), rows(org[:,2]),
            rows(dirn[:,0]), rows(dirn[:,1]), rows(dirn[:,2]), rows(t_max)]
    ray_spec = pl.BlockSpec((bt, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, n_nodes=n_nodes),
        grid=(n_tiles // bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec]*7
                 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec]*4,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32)],
    )(nodes_rows, *args, tri_geom)
    return outs

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
scene = models.build("cornell_dragon")
pack, _ = sc.compile_scene(scene)
n_nodes = int(pack.bvh_rows.shape[0])
N = 1 << 17
rng = np.random.default_rng(0)

def probe(org, dirn, label):
    t_max = jnp.full((N,), np.inf, jnp.float32)
    t, i, s, l = traverse(pack.bvh_rows, pack.tri_geom,
                          jnp.asarray(org), jnp.asarray(dirn), t_max, n_nodes=n_nodes)
    s = np.asarray(s)[:, 0].astype(np.float64); l = np.asarray(l)[:, 0].astype(np.float64)
    t0 = time.time()
    for _ in range(3):
        o = traverse(pack.bvh_rows, pack.tri_geom, jnp.asarray(org), jnp.asarray(dirn), t_max, n_nodes=n_nodes)
    o[0].block_until_ready()
    dt = (time.time()-t0)/3
    n_pk = N // TILE
    tot_steps = s.sum(); tot_leaves = l.sum()
    print(f"{label}: {dt*1e3:.0f} ms | steps/packet {s.mean():.0f} | leaves/packet {l.mean():.0f} | "
          f"ns/step {dt/tot_steps*1e9:.0f} | us/leaf-if-all {dt/max(tot_leaves,1)*1e6:.2f}")

org = np.tile(np.array([278,278,-800], np.float32), (N,1))
px = rng.uniform(0,555,(N,)); py = rng.uniform(0,555,(N,))
dirn = np.stack([px-278, py-278, np.full((N,),800.0)],-1).astype(np.float32)
k = np.lexsort((py//8, px//8))
probe(org[k], dirn[k], "coh-sorted")
org2 = rng.uniform(0,555,(N,3)).astype(np.float32)
dirn2 = rng.normal(size=(N,3)).astype(np.float32)
probe(org2, dirn2, "incoherent")
