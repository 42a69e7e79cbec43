"""Pallas TPU kernel: packet BVH traversal over triangle clusters.

XLA's lowering of the per-lane gather-driven while_loop (ops/intersect.py)
is pathological on TPU (~10k rays/s on the 870k-tri benchmark: every BVH
step is a random gather per lane).  This kernel restructures the traversal
around what the hardware does well:

  * the scene BVH has CLUSTER-sized leaves (scene/bvh_builder.py builds it
    with leaf_size = CLUSTER); the node table is small enough to live in
    VMEM whole (~16 KB per 1k nodes),
  * a TILE of rays traverses *together* with a single shared cursor over
    the threaded (hit/miss skip-link) node order — scalar control, no
    per-lane divergence,
  * when the packet reaches a leaf, its cluster of CLUSTER triangles is
    DMA'd HBM -> VMEM as one contiguous (ROWS, CLUSTER) block and tested
    against all TILE rays at once: a dense (TILE, CLUSTER) Möller–Trumbore
    evaluated on the VPU — regular, branch-free vector work,
  * rays enter the kernel transposed (component-major, (TILE, n_tiles))
    so every per-ray quantity is a (TILE, 1) sublane vector and every
    per-triangle quantity a (1, CLUSTER) lane vector; their products tile
    the (TILE, CLUSTER) = (sublane, lane) VPU geometry exactly.

Packet traversal visits the union of the packet's nodes, so coherent rays
(primary, shadow) are near-optimal while incoherent bounce rays do extra
AABB tests; sorting the wavefront by direction octant between bounces
restores most coherence (render/renderer.py).

Correctness parity: same threaded BVH, same Möller–Trumbore arithmetic as
the jnp path (reference semantics: mesh.rs:61-101, octree traversal
mesh.rs:165-197); hits are (t, global padded triangle slot).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Triangles per BVH leaf == per DMA'd cluster.  Keep in sync with the scene
# compiler (it builds the BVH with this leaf size and packs tri_geom) and
# with ops/pallas_bvh8.py (the VMEM-resident kernel shares the packing).
CLUSTER = 128
# Rays per traversal packet.
TILE = 128
# Packets per grid step: ray blocks are (TILES_PER_BLOCK, TILE) — the
# minimal f32 (8, 128) VMEM tile — and the kernel loops packets via dynamic
# sublane slices (dynamic *lane* slicing does not lower on Mosaic).
TILES_PER_BLOCK = 8
# Rows of the packed per-cluster geometry block:
# 0-2 v0.xyz, 3-5 e1.xyz, 6-8 e2.xyz, 9 hit_back flag, 10-15 reserved.
GEOM_ROWS = 16

DET_EPS = 1e-12
BIG = 3.4e38  # plain float: jnp scalars would be captured consts in pallas


def _kernel(nodes_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
            tri_hbm, t_out, i_out, *, n_nodes: int):
    """TILES_PER_BLOCK packets of TILE rays vs the whole cluster BVH.

    nodes_ref: (M, 16) f32 VMEM — per node
      [0:3] aabb min, [3:6] aabb max, [6] hit_link, [7] miss_link,
      [8] leaf cluster id + 1 (0 = internal node).
    o*/d*/tmax: (TILES_PER_BLOCK, TILE) f32 VMEM ray blocks.
    tri_hbm: (n_clusters, GEOM_ROWS, CLUSTER) f32 in HBM/ANY.
    t_out/i_out: (TILES_PER_BLOCK, TILE) f32/i32 VMEM outputs.
    """

    def run(buf, sem, best_t_ref, best_i_ref):
        def col(ref, j):
            # packet j's rays as a (TILE, 1) sublane vector
            return ref[pl.ds(j, 1), :].reshape(TILE, 1)

        def packet(j, _):
            o_x, o_y, o_z = col(ox, j), col(oy, j), col(oz, j)
            d_x, d_y, d_z = col(dx, j), col(dy, j), col(dz, j)
            inv_x = 1.0 / d_x
            inv_y = 1.0 / d_y
            inv_z = 1.0 / d_z

            # clamp +inf to BIG: an all-miss cluster yields new_t == BIG,
            # which must NOT beat the initial best (BIG < inf would)
            best_t_ref[:, :] = jnp.minimum(col(tmax_ref, j), BIG)
            best_i_ref[:, :] = jnp.full((TILE, 1), -1, jnp.int32)

            def cond(node):
                return node < n_nodes

            def body(node):
                lo_x = nodes_ref[node, 0]
                lo_y = nodes_ref[node, 1]
                lo_z = nodes_ref[node, 2]
                hi_x = nodes_ref[node, 3]
                hi_y = nodes_ref[node, 4]
                hi_z = nodes_ref[node, 5]

                best_t = best_t_ref[:, :]
                tx0 = (lo_x - o_x) * inv_x
                tx1 = (hi_x - o_x) * inv_x
                ty0 = (lo_y - o_y) * inv_y
                ty1 = (hi_y - o_y) * inv_y
                tz0 = (lo_z - o_z) * inv_z
                tz1 = (hi_z - o_z) * inv_z
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), best_t),
                )
                any_hit = jnp.any(near <= far)

                leaf_p1 = nodes_ref[node, 8].astype(jnp.int32)

                @pl.when(any_hit & (leaf_p1 > 0))
                def _():
                    cluster = leaf_p1 - 1
                    dma = pltpu.make_async_copy(
                        tri_hbm.at[cluster], buf, sem
                    )
                    dma.start()
                    dma.wait()

                    v0x, v0y, v0z = buf[0:1, :], buf[1:2, :], buf[2:3, :]
                    e1x, e1y, e1z = buf[3:4, :], buf[4:5, :], buf[5:6, :]
                    e2x, e2y, e2z = buf[6:7, :], buf[7:8, :], buf[8:9, :]
                    back = buf[9:10, :]

                    # pvec = d x e2   -> (TILE, CLUSTER)
                    px = d_y * e2z - d_z * e2y
                    py = d_z * e2x - d_x * e2z
                    pz = d_x * e2y - d_y * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    dd = jnp.where(back > 0.5, jnp.abs(det), det)
                    ok = dd > DET_EPS
                    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                    # b = o - v0
                    bx = o_x - v0x
                    by = o_y - v0y
                    bz = o_z - v0z
                    u = (bx * px + by * py + bz * pz) * inv_det
                    # qvec = b x e1
                    qx = by * e1z - bz * e1y
                    qy = bz * e1x - bx * e1z
                    qz = bx * e1y - by * e1x
                    v = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
                    best_t2 = best_t_ref[:, :]
                    ok &= (t > T_MIN_STATIC) & (t < best_t2)
                    tt = jnp.where(ok, t, BIG)
                    new_t = jnp.min(tt, axis=1, keepdims=True)   # (TILE, 1)
                    new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                    better = new_t < best_t2
                    best_i_ref[:, :] = jnp.where(
                        better, cluster * CLUSTER + new_i, best_i_ref[:, :]
                    )
                    best_t_ref[:, :] = jnp.where(better, new_t, best_t2)

                hit_link = nodes_ref[node, 6].astype(jnp.int32)
                miss_link = nodes_ref[node, 7].astype(jnp.int32)
                return jnp.where(any_hit, hit_link, miss_link)

            lax.while_loop(cond, body, jnp.int32(0))

            t_out[pl.ds(j, 1), :] = best_t_ref[:, :].reshape(1, TILE)
            i_out[pl.ds(j, 1), :] = best_i_ref[:, :].reshape(1, TILE)
            return 0

        lax.fori_loop(0, ox.shape[0], packet, 0)

    pl.run_scoped(
        run,
        buf=pltpu.VMEM((GEOM_ROWS, CLUSTER), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
        best_t_ref=pltpu.VMEM((TILE, 1), jnp.float32),
        best_i_ref=pltpu.VMEM((TILE, 1), jnp.int32),
    )


# Static minimum hit distance (reference: camera.rs:294 interval lower
# bound 0.001); rays are cast with unnormalized directions so this is in
# |dir| units, matching the jnp path.
T_MIN_STATIC = 1e-3


@functools.partial(jax.jit, static_argnames=("n_nodes", "interpret"))
def _traverse(nodes_rows, tri_geom, org, dirn, t_max, *, n_nodes, interpret):
    """org/dirn: (N, 3) with N a multiple of TILE * TILES_PER_BLOCK.
    Returns (t, slot)."""
    n = org.shape[0]
    n_tiles = n // TILE
    bt = min(TILES_PER_BLOCK, n_tiles)

    def rows(a):
        return a.reshape(n_tiles, TILE)

    args = [
        rows(org[:, 0]), rows(org[:, 1]), rows(org[:, 2]),
        rows(dirn[:, 0]), rows(dirn[:, 1]), rows(dirn[:, 2]),
        rows(t_max),
    ]

    ray_spec = pl.BlockSpec((bt, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        functools.partial(_kernel, n_nodes=n_nodes),
        grid=(n_tiles // bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [ray_spec] * 7
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
        ],
        interpret=interpret,
    )(nodes_rows, *args, tri_geom)
    return t.reshape(n), idx.reshape(n)


def intersect_triangles_pallas(pack, org, dirn, t_min, t_max,
                               interpret: bool = False):
    """Drop-in replacement for ops.intersect.intersect_triangles on TPU.

    Requires pack.bvh_rows / pack.tri_geom (cluster-packed scene).  t_min is
    static (T_MIN_STATIC) in this path; the wavefront integrator always
    passes the same epsilon.  Returns (t, slot) with t == t_max where the
    BVH found nothing closer.
    """
    n = org.shape[0]
    n_nodes = int(pack.bvh_rows.shape[0])
    if n_nodes == 0 or pack.tri_geom.shape[0] == 0:
        return t_max, jnp.full((n,), -1, jnp.int32)

    # pad to a whole number of (TILES_PER_BLOCK x TILE) ray blocks when the
    # batch spans more than one block, else to a whole number of packets
    quantum = TILE * TILES_PER_BLOCK if n > TILE * TILES_PER_BLOCK else TILE
    n_pad = -(-n // quantum) * quantum
    if n_pad != n:
        pad = n_pad - n
        org = jnp.concatenate([org, jnp.ones((pad, 3), org.dtype)], 0)
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), org.dtype)], 0)
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)], 0)

    from .intersect import call_detached

    t, idx = call_detached(
        functools.partial(_traverse, n_nodes=n_nodes, interpret=interpret),
        pack.bvh_rows, pack.tri_geom,
        org.astype(jnp.float32), dirn.astype(jnp.float32),
        t_max.astype(jnp.float32),
    )
    t = t[:n]
    idx = idx[:n]
    # parity with the jnp path: inf where no triangle hit
    miss = idx < 0
    return jnp.where(miss, jnp.asarray(t_max[:n], jnp.float32), t), idx
