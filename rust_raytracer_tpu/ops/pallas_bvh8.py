"""Pallas TPU kernel: packet traversal of an 8-wide BVH, all geometry
VMEM-resident.

Second-generation traversal kernel (supersedes ops/pallas_intersect.py's
DMA-per-leaf threaded walk for scenes that fit on-chip).  Design, from
measured v5e behavior (.scratch/probe_hw.py):

  * VMEM is >= 120 MB on v5e: the full cluster-packed triangle table
    (~56 MB for the 870k-tri benchmark) plus the BVH8 node tables live in
    VMEM for the whole kernel — the per-leaf HBM DMA (and its serialized
    wait) is gone entirely.
  * Traversal steps are 8-wide: one step tests a packet of TILE rays
    against all 8 children of a node as (8 sublanes x TILE lanes) VPU
    tiles — full lane utilization, vs the threaded walk's (TILE, 1)
    column ops that used 1/128th of each lane vector.
  * The stack holds both internal nodes and leaves (leaves as negative
    cluster ids), so the while body has exactly one AABB block and one
    Möller–Trumbore block, dispatched with lax.cond — small code, fast
    compile, no 8x leaf unrolling.
  * Leaf clusters are CLUSTER=128 triangles tested densely against the
    packet: (TILE rays x 128 tris) Möller–Trumbore on the VPU at
    ~50 Gpairs/s sustained (probe_mt4).

Same packet-union caveat as before: all TILE rays traverse the union of
their node sets, so the integrator's (octant, Morton) compaction sort is
what keeps bounce packets tight (render/integrator.py).

Correctness parity: same Möller–Trumbore arithmetic and hit rules as the
jnp path (reference: mesh.rs:61-101; traversal replaces octree.rs:63-116 —
closest-hit semantics are traversal-order independent).  Hits are
(t, global padded triangle slot).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Triangles per BVH leaf == lanes of a geometry block.  Must match the
# scene compiler's packing (scene/compiler.py) and bvh_builder leaf size.
CLUSTER = 128
# Rays per traversal packet (sublanes of the MT tile).
TILE = 128
# Packets per ray block (minimal f32 (8, 128) VMEM tile).
TILES_PER_BLOCK = 8
# Rows of the packed per-cluster geometry block:
# 0-2 v0.xyz, 3-5 e1.xyz, 6-8 e2.xyz, 9 hit_back flag, 10-15 reserved.
GEOM_ROWS = 16
# Traversal stack entries (node ids + leaf ids).  Greedy-collapsed BVH8
# depth is <= ~12 for any scene that fits VMEM; 8 pushes per pop bounds
# the stack at 8 * depth + 1.
STACK = 160

DET_EPS = 1e-12
BIG = 3.4e38
T_MIN_STATIC = 1e-3  # reference: camera.rs:294 interval lower bound


def _kernel(aabb8, ox, oy, oz, dx, dy, dz, tmax_ref,
            tri_ref, t_out, i_out):
    """TILES_PER_BLOCK packets of TILE rays vs the BVH8.

    aabb8: (n8, 8, 128) f32 VMEM — [node, child, lane]: lanes 0-5 the
      child AABB (lo_xyz, hi_xyz); lane 6 the child id as exact float
      (0 empty, >0 node, <0 ~cluster); lane 7 of slot o the packed
      near-first slot permutation for ray octant o (scene/bvh8.py).
    o*/d*/tmax: (TILES_PER_BLOCK, TILE) f32 VMEM ray blocks.
    tri_ref: (n_clusters, GEOM_ROWS, CLUSTER) f32 VMEM.
    t_out/i_out: (TILES_PER_BLOCK, TILE) f32/i32 VMEM outputs.
    """

    pow2 = jnp.left_shift(
        jnp.int32(1), lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    )

    def run(stack_ref, best_t, best_i, best_t_row):
        def packet(j, _):
            # row forms (1, TILE): AABB phase (children on sublanes)
            o_xr = ox[pl.ds(j, 1), :]
            o_yr = oy[pl.ds(j, 1), :]
            o_zr = oz[pl.ds(j, 1), :]
            d_xr = dx[pl.ds(j, 1), :]
            d_yr = dy[pl.ds(j, 1), :]
            d_zr = dz[pl.ds(j, 1), :]
            inv_xr = 1.0 / d_xr
            inv_yr = 1.0 / d_yr
            inv_zr = 1.0 / d_zr
            # col forms (TILE, 1): MT phase (triangles on lanes)
            o_xc = o_xr.reshape(TILE, 1)
            o_yc = o_yr.reshape(TILE, 1)
            o_zc = o_zr.reshape(TILE, 1)
            d_xc = d_xr.reshape(TILE, 1)
            d_yc = d_yr.reshape(TILE, 1)
            d_zc = d_zr.reshape(TILE, 1)

            # clamp +inf to BIG: an all-miss cluster yields new_t == BIG,
            # which must NOT beat the initial best (BIG < inf would)
            t0 = jnp.minimum(tmax_ref[pl.ds(j, 1), :], BIG)
            best_t[:, :] = t0.reshape(TILE, 1)
            best_t_row[0:1, :] = t0
            best_i[:, :] = jnp.full((TILE, 1), -1, jnp.int32)

            stack_ref[0] = jnp.int32(0)

            def cond(sp):
                return sp > 0

            def body(sp):
                sp1 = sp - 1
                v = stack_ref[sp1]

                def leaf_fn(sp1):
                    cluster = -v - 1
                    v0x = tri_ref[cluster, 0:1, :]
                    v0y = tri_ref[cluster, 1:2, :]
                    v0z = tri_ref[cluster, 2:3, :]
                    e1x = tri_ref[cluster, 3:4, :]
                    e1y = tri_ref[cluster, 4:5, :]
                    e1z = tri_ref[cluster, 5:6, :]
                    e2x = tri_ref[cluster, 6:7, :]
                    e2y = tri_ref[cluster, 7:8, :]
                    e2z = tri_ref[cluster, 8:9, :]
                    back = tri_ref[cluster, 9:10, :]

                    # pvec = d x e2   -> (TILE, CLUSTER)
                    px = d_yc * e2z - d_zc * e2y
                    py = d_zc * e2x - d_xc * e2z
                    pz = d_xc * e2y - d_yc * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    dd = jnp.where(back > 0.5, jnp.abs(det), det)
                    ok = dd > DET_EPS
                    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                    bx = o_xc - v0x
                    by = o_yc - v0y
                    bz = o_zc - v0z
                    u = (bx * px + by * py + bz * pz) * inv_det
                    qx = by * e1z - bz * e1y
                    qy = bz * e1x - bx * e1z
                    qz = bx * e1y - by * e1x
                    w = (d_xc * qx + d_yc * qy + d_zc * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0) & (u + w <= 1.0)
                    bt = best_t[:, :]
                    ok &= (t > T_MIN_STATIC) & (t < bt)
                    tt = jnp.where(ok, t, BIG)
                    new_t = jnp.min(tt, axis=1, keepdims=True)     # (TILE, 1)
                    new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                    better = new_t < bt
                    best_i[:, :] = jnp.where(
                        better, cluster * CLUSTER + new_i, best_i[:, :]
                    )
                    nt = jnp.where(better, new_t, bt)
                    best_t[:, :] = nt
                    best_t_row[0:1, :] = nt.reshape(1, TILE)
                    return sp1

                def internal_fn(sp1):
                    lo_x = aabb8[v, :, 0:1]
                    lo_y = aabb8[v, :, 1:2]
                    lo_z = aabb8[v, :, 2:3]
                    hi_x = aabb8[v, :, 3:4]
                    hi_y = aabb8[v, :, 4:5]
                    hi_z = aabb8[v, :, 5:6]
                    tx0 = (lo_x - o_xr) * inv_xr          # (8, TILE)
                    tx1 = (hi_x - o_xr) * inv_xr
                    ty0 = (lo_y - o_yr) * inv_yr
                    ty1 = (hi_y - o_yr) * inv_yr
                    tz0 = (lo_z - o_zr) * inv_zr
                    tz1 = (hi_z - o_zr) * inv_zr
                    # clamp below by the ray interval start: without it,
                    # boxes fully BEHIND the origin (near < far < 0) pass
                    # the slab test and the packet descends into them —
                    # bounce rays mid-scene pay ~2x visits, and dead lanes
                    # (t_max = 0) re-walk their stale neighborhood instead
                    # of exiting at the root (camera.rs:294 interval
                    # lower bound).
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), T_MIN_STATIC),
                    )
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1),
                                    best_t_row[0:1, :]),
                    )
                    anyc = jnp.any(near <= far, axis=1, keepdims=True)
                    bits = jnp.sum(jnp.where(anyc, pow2, 0))

                    # push hit children; slot 7 pushed first so slot 0
                    # (first on the Morton curve) pops first.  (A
                    # per-octant near-first permutation — still packed in
                    # lane 7 — was measured ~30% SLOWER here: the extra
                    # dynamic scalar reads outweigh t-pruning for
                    # 128-ray union packets.)
                    off = jnp.int32(0)
                    for c in range(7, -1, -1):
                        child = aabb8[v, c, 6].astype(jnp.int32)
                        push = (lax.shift_right_logical(
                            bits, jnp.int32(c)) & 1) > 0
                        push &= child != 0

                        @pl.when(push)
                        def _(off=off, child=child):
                            stack_ref[sp1 + off] = child

                        off = off + push.astype(jnp.int32)
                    return sp1 + off

                return lax.cond(v < 0, leaf_fn, internal_fn, sp1)

            lax.while_loop(cond, body, jnp.int32(1))

            t_out[pl.ds(j, 1), :] = best_t[:, :].reshape(1, TILE)
            i_out[pl.ds(j, 1), :] = best_i[:, :].reshape(1, TILE)
            return 0

        lax.fori_loop(0, ox.shape[0], packet, 0)

    pl.run_scoped(
        run,
        stack_ref=pltpu.SMEM((STACK,), jnp.int32),
        best_t=pltpu.VMEM((TILE, 1), jnp.float32),
        best_i=pltpu.VMEM((TILE, 1), jnp.int32),
        best_t_row=pltpu.VMEM((8, TILE), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse(aabb8, tri_geom, org, dirn, t_max, *, interpret):
    """org/dirn: (N, 3) with N a multiple of TILE.  Returns (t, slot)."""
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
    vmem_bytes = (
        aabb8.size * 4 + tri_geom.size * 4
        + (2 * bt * TILE * 4) * 10  # ray blocks + outputs, double-buffered
        + (1 << 20)
    )
    t, idx = pl.pallas_call(
        _kernel,
        grid=(n_tiles // bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [ray_spec] * 7
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes), 127 * 1024 * 1024),
        ),
        interpret=interpret,
    )(aabb8, *args, tri_geom)
    return t.reshape(n), idx.reshape(n)


def intersect_triangles_bvh8(pack, org, dirn, t_min, t_max,
                             interpret: bool = False):
    """Closest-hit of the scene's triangles via the VMEM-resident BVH8.

    Drop-in replacement for ops.intersect.intersect_triangles on TPU.
    t_min is static (T_MIN_STATIC) in this path.  Returns (t, slot) with
    t == t_max where the BVH found nothing closer.
    """
    n = org.shape[0]
    if pack.bvh8_child.shape[0] == 0 or pack.tri_geom.shape[0] == 0:
        return t_max, jnp.full((n,), -1, jnp.int32)

    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = n_pad - n
        org = jnp.concatenate([org, jnp.ones((pad, 3), org.dtype)], 0)
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), org.dtype)], 0)
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)], 0)

    from .intersect import call_detached

    t, idx = call_detached(
        functools.partial(_traverse, interpret=interpret),
        pack.bvh8_aabb, pack.tri_geom,
        org.astype(jnp.float32), dirn.astype(jnp.float32),
        t_max.astype(jnp.float32),
    )
    t = t[:n]
    idx = idx[:n]
    # parity with the jnp path: caller's t_max where no triangle hit
    miss = idx < 0
    return jnp.where(miss, jnp.asarray(t_max[:n], jnp.float32), t), idx
