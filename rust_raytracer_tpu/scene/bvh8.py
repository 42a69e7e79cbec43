"""Host-side 8-wide BVH (BVH8) collapse for the TPU traversal kernel.

The binary threaded BVH (scene/bvh_builder.py, native/bvh.cc — reference
semantics: object/bvh.rs + object/mesh/octree.rs) is the build structure;
the TPU kernel (ops/pallas_bvh8.py) wants wide nodes so each traversal step
tests a full packet of rays against 8 child AABBs in a single
(8 sublanes x TILE lanes) VPU tile — 8x the node fanout of the threaded
walk at ~1/40th the per-step cost.

Collapse: starting from a binary node's two children, repeatedly replace
the internal child with the largest surface area by its own two children
until there are 8 slots or only leaves remain (the standard BVH2->BVH8
greedy collapse).  Children are ordered by Morton code of their centroid
so the static pop order follows a space-filling curve.

Kernel-facing layout (see ops/pallas_bvh8.py for the access patterns):
  aabb8:  (n8, 8, 128) f32 — [node, child_slot, field]; fields 0-5 are
          lo_x, lo_y, lo_z, hi_x, hi_y, hi_z; empty slots get inverted
          (+BIG/-BIG) boxes that never hit.  Lane 6 holds the slot's child
          id as an exact small float (0 empty, >0 internal BVH8 node id,
          <0 leaf: cluster id = -(c+1); node 0 is the root and never a
          child, so 0 can mean "empty").  Lane 7 of slot o holds the
          per-octant near-first traversal permutation for ray octant o,
          packed 3 bits per rank (values < 2^24, exact in f32).  Lanes
          8-127 are tile padding.
  child8: (n8, 8) int32 — the lane-6 data as integers (host-side checks).
  order8: (n8, 8) uint32 — the lane-7 data as integers.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import bvh_builder

BIG = 3.0e38


class BVH8(NamedTuple):
    aabb8: np.ndarray   # (n8, 8, 128) f32
    child8: np.ndarray  # (n8, 8) int32
    order8: np.ndarray  # (n8, 8) uint32 — per ray-direction octant, the 8
    #                      child slots packed 3 bits each, nearest first
    #                      (slot of k-th nearest child = (order >> 3k) & 7)


def _pack_orders(centers: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Per-octant near-first slot permutations, packed 3 bits per rank.

    centers: (8, 3) child AABB centers; valid: (8,) slot has a child.
    Octant o has sign bits (o>>2: x<0, o>>1&1: y<0, o&1: z<0) matching
    render/integrator._compaction_key.  Nearest child along the ray
    direction = smallest signed projection; empty slots sort last.
    """
    out = np.zeros((8,), np.uint32)
    for o in range(8):
        s = np.array([
            -1.0 if (o >> 2) & 1 else 1.0,
            -1.0 if (o >> 1) & 1 else 1.0,
            -1.0 if o & 1 else 1.0,
        ])
        proj = centers @ s
        proj = np.where(valid, proj, np.inf)
        ranks = np.argsort(proj, kind="stable")
        packed = np.uint32(0)
        for k in range(8):
            packed |= np.uint32(int(ranks[k]) & 7) << np.uint32(3 * k)
        out[o] = packed
    return out


def _morton3_single(p: np.ndarray) -> int:
    q = np.clip((p * 1023.0).astype(np.int64), 0, 1023)

    def expand(v):
        v = int(v)
        v = (v | (v << 32)) & 0x1F00000000FFFF
        v = (v | (v << 16)) & 0x1F0000FF0000FF
        v = (v | (v << 8)) & 0x100F00F00F00F00F
        v = (v | (v << 4)) & 0x10C30C30C30C30C3
        v = (v | (v << 2)) & 0x1249249249249249
        return v

    return expand(q[0]) | (expand(q[1]) << 1) | (expand(q[2]) << 2)


def collapse(bvh: bvh_builder.FlatBVH, cluster: int) -> BVH8:
    """Collapse the threaded binary BVH into BVH8 tables.

    `cluster` is the triangle count per leaf (== the builder's leaf_size);
    binary leaf_start / cluster is the cluster id the kernel indexes
    tri_geom with.
    """
    node_min = bvh.node_min
    node_max = bvh.node_max
    leaf_start = bvh.leaf_start
    miss = bvh.miss_link
    n_bin = node_min.shape[0]

    if n_bin == 0:
        return BVH8(
            aabb8=np.zeros((0, 8, 128), np.float32),
            child8=np.zeros((0, 8), np.int32),
            order8=np.zeros((0, 8), np.uint32),
        )

    def kids(n: int):
        """Children of binary internal node n (preorder: first child is
        n + 1, second child follows the first child's subtree)."""
        c1 = n + 1
        c2 = int(miss[c1])
        return c1, c2

    area = (node_max - node_min)
    area = 2.0 * (
        area[:, 0] * area[:, 1] + area[:, 1] * area[:, 2] + area[:, 0] * area[:, 2]
    )

    # scene extent for Morton child ordering
    lo = node_min[0]
    span = np.maximum(node_max[0] - lo, 1e-12)

    aabbs = []
    childs = []

    # Worklist of (bvh8_id, binary_node). BVH8 ids assigned on creation.
    if leaf_start[0] >= 0:
        # degenerate: root is a single leaf
        aabb = np.full((8, 128), 0.0, np.float32)
        aabb[:, 0:3] = BIG
        aabb[:, 3:6] = -BIG
        aabb[0, 0:3] = node_min[0]
        aabb[0, 3:6] = node_max[0]
        ch = np.zeros((8,), np.int32)
        ch[0] = -(int(leaf_start[0]) // cluster + 1)
        order = _pack_orders(np.zeros((8, 3)), np.arange(8) == 0)[None]
        aabb[:, 6] = ch.astype(np.float32)
        aabb[:, 7] = order[0].astype(np.float32)
        return BVH8(aabb8=aabb[None], child8=ch[None], order8=order)

    aabb_rows = []  # per BVH8 node: (8, 6) f32
    child_rows = []  # per BVH8 node: (8,) i32
    order_rows = []  # per BVH8 node: (8,) u32 per-octant packed permutation
    next_id = 1
    work = [(0, 0)]
    while work:
        my_id, n = work.pop()
        # grow the child set greedily by splitting the largest internal
        slots = list(kids(n))
        while len(slots) < 8:
            best = -1
            best_a = -1.0
            for i, s in enumerate(slots):
                if leaf_start[s] < 0 and area[s] > best_a:
                    best_a = area[s]
                    best = i
            if best < 0:
                break
            s = slots.pop(best)
            slots.extend(kids(s))
        # order children along the Morton curve of their centroids
        slots.sort(
            key=lambda s: _morton3_single(
                ((node_min[s] + node_max[s]) * 0.5 - lo) / span
            )
        )
        ab = np.zeros((8, 6), np.float32)
        ab[:, 0:3] = BIG
        ab[:, 3:6] = -BIG
        ch = np.zeros((8,), np.int32)
        for k, s in enumerate(slots):
            ab[k, 0:3] = node_min[s]
            ab[k, 3:6] = node_max[s]
            if leaf_start[s] < 0:
                ch[k] = next_id
                work.append((next_id, s))
                next_id += 1
            else:
                ch[k] = -(int(leaf_start[s]) // cluster + 1)
        valid = ch != 0
        centers = (ab[:, 0:3] + ab[:, 3:6]) * 0.5
        orders = _pack_orders(centers, valid)

        while len(aabb_rows) <= my_id:
            aabb_rows.append(None)
            child_rows.append(None)
            order_rows.append(None)
        aabb_rows[my_id] = ab
        child_rows[my_id] = ch
        order_rows[my_id] = orders

    n8 = next_id
    aabb8 = np.zeros((n8, 8, 128), np.float32)
    aabb8[:, :, 0:3] = BIG
    aabb8[:, :, 3:6] = -BIG
    aabb8[:, :, 0:6] = np.stack(aabb_rows[:n8])
    child8 = np.stack(child_rows[:n8]).astype(np.int32)
    order8 = np.stack(order_rows[:n8]).astype(np.uint32)
    aabb8[:, :, 6] = child8.astype(np.float32)
    aabb8[:, :, 7] = order8.astype(np.float32)

    return BVH8(aabb8=aabb8, child8=child8, order8=order8)


class PackedBVH8(NamedTuple):
    """BVH8 with globally leaf-packed triangle clusters + a matching
    threaded flat BVH for the portable jnp traversal."""
    aabb8: np.ndarray       # (n8, 8, 128) f32 (layout as BVH8.aabb8)
    child8: np.ndarray      # (n8, 8) int32
    order8: np.ndarray      # (n8, 8) uint32
    cluster_slots: np.ndarray  # (n_clusters, cluster) int64 original tri
    #                             indices, -1 = degenerate padding
    # threaded mirror over the same tree (preorder + skip links):
    node_min: np.ndarray    # (M, 3) f32
    node_max: np.ndarray    # (M, 3) f32
    hit_link: np.ndarray    # (M,) i32
    miss_link: np.ndarray   # (M,) i32
    leaf_start: np.ndarray  # (M,) i32 (cluster_id * cluster, -1 internal)


def threaded_from_bvh8(b8: BVH8, cluster: int):
    """Emit a threaded (preorder + skip-link) flat BVH from a BVH8 — the
    layout ops/intersect.py's portable per-lane walk and the DMA-streaming
    kernel consume.  hit = next preorder node, miss = index past the
    subtree; a leaf's own links are both i + 1."""
    child8 = b8.child8
    aabb8 = b8.aabb8
    t_min, t_max_, t_hit, t_miss, t_leaf = [], [], [], [], []

    def emit(node: int, box_lo, box_hi) -> None:
        me = len(t_min)
        t_min.append(np.asarray(box_lo, np.float32))
        t_max_.append(np.asarray(box_hi, np.float32))
        t_leaf.append(-1)
        t_hit.append(me + 1)
        t_miss.append(0)  # patched once the subtree size is known
        for k in range(8):
            c = int(child8[node, k])
            if c == 0:
                continue
            blo = aabb8[node, k, 0:3]
            bhi = aabb8[node, k, 3:6]
            if c > 0:
                emit(c, blo, bhi)
            else:
                i = len(t_min)
                t_min.append(np.asarray(blo, np.float32))
                t_max_.append(np.asarray(bhi, np.float32))
                t_leaf.append((-c - 1) * cluster)
                t_hit.append(i + 1)
                t_miss.append(i + 1)
        t_miss[me] = len(t_min)

    import sys
    rec = sys.getrecursionlimit()
    sys.setrecursionlimit(max(rec, 100000))
    root_lo = aabb8[0, :, 0:3].min(0)
    root_hi = aabb8[0, :, 3:6].max(0)
    emit(0, root_lo, root_hi)
    sys.setrecursionlimit(rec)
    return (np.stack(t_min), np.stack(t_max_),
            np.asarray(t_hit, np.int32), np.asarray(t_miss, np.int32),
            np.asarray(t_leaf, np.int32))


def collapse_packed(bvh: bvh_builder.FlatBVH, cluster: int,
                    build_leaf_size: int) -> PackedBVH8:
    """Pack the binary BVH's small SAH leaves (build_leaf_size tris) into
    ~full `cluster`-triangle blocks, then build the BVH8 over the packed
    clusters.

    Binary SAH leaves average ~68% fill, and a cluster costs the dense
    (TILE x cluster) Möller–Trumbore regardless of fill.  Packing greedily
    walks the leaves in preorder (== spatially coherent SAH order) and
    concatenates consecutive leaves while they fit — measured fill goes to
    ~95%, so the union traversal visits proportionally fewer clusters.
    The cluster-level hierarchy is a fresh binned-SAH build over cluster
    AABBs, collapsed 8-wide by `collapse`.
    """
    leaf_start = bvh.leaf_start
    tri_order = bvh.tri_order
    n_bin = bvh.node_min.shape[0]

    empty = PackedBVH8(
        aabb8=np.zeros((0, 8, 128), np.float32),
        child8=np.zeros((0, 8), np.int32),
        order8=np.zeros((0, 8), np.uint32),
        cluster_slots=np.zeros((0, cluster), np.int64),
        node_min=np.zeros((0, 3), np.float32),
        node_max=np.zeros((0, 3), np.float32),
        hit_link=np.zeros((0,), np.int32),
        miss_link=np.zeros((0,), np.int32),
        leaf_start=np.zeros((0,), np.int32),
    )
    if n_bin == 0:
        return empty

    # binary leaves in preorder, with their real (non-padding) triangles
    leaf_nodes = np.nonzero(leaf_start >= 0)[0]
    leaf_real = []
    for s in leaf_nodes:
        a = tri_order[leaf_start[s]: leaf_start[s] + build_leaf_size]
        leaf_real.append(a[a >= 0])

    clusters: list = []
    c_lo: list = []
    c_hi: list = []
    run: list = []
    run_ids: list = []
    cnt = 0
    for i, s in enumerate(leaf_nodes):
        c = leaf_real[i].shape[0]
        if run and cnt + c > cluster:
            clusters.append(np.concatenate(run))
            c_lo.append(bvh.node_min[run_ids].min(0))
            c_hi.append(bvh.node_max[run_ids].max(0))
            run, run_ids, cnt = [], [], 0
        run.append(leaf_real[i])
        run_ids.append(s)
        cnt += c
    if run:
        clusters.append(np.concatenate(run))
        c_lo.append(bvh.node_min[run_ids].min(0))
        c_hi.append(bvh.node_max[run_ids].max(0))

    n_clusters = len(clusters)
    c_lo = np.stack(c_lo)
    c_hi = np.stack(c_hi)

    # cluster-level hierarchy: fresh binned-SAH build over cluster boxes,
    # one cluster per leaf, then the standard 8-wide collapse
    bvh2 = bvh_builder.build(c_lo, c_hi, leaf_size=1)
    # relabel clusters in bvh2's order so leaf_start IS the cluster id
    perm = bvh2.tri_order  # (n_clusters,) no padding at leaf_size=1
    assert perm.shape[0] == n_clusters and np.all(perm >= 0)
    clusters = [clusters[int(p)] for p in perm]
    b8 = collapse(bvh2, cluster=1)

    cluster_slots = np.full((n_clusters, cluster), -1, np.int64)
    for c, tris in enumerate(clusters):
        cluster_slots[c, : tris.shape[0]] = tris

    nmin, nmax, hl, ml, ls = threaded_from_bvh8(b8, cluster)
    return PackedBVH8(
        aabb8=b8.aabb8, child8=b8.child8, order8=b8.order8,
        cluster_slots=cluster_slots,
        node_min=nmin, node_max=nmax,
        hit_link=hl, miss_link=ml, leaf_start=ls,
    )


def max_depth(b: BVH8) -> int:
    """Tree depth (for kernel stack sizing)."""
    if b.child8.shape[0] == 0:
        return 0
    depth = {0: 1}
    out = 1
    for n in range(b.child8.shape[0]):
        d = depth[n]
        for c in b.child8[n]:
            if c > 0:
                depth[int(c)] = d + 1
                out = max(out, d + 1)
    return out
