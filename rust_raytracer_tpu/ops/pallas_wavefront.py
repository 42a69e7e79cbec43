"""Static cull -> extract -> batched-MT triangle intersection ("wavefront
pipeline") — the third-generation TPU traversal, replacing in-kernel BVH
walks for incoherent bounce wavefronts.

Why (measured on the cornell_dragon steady-state wavefront, v5e):

  * The BVH8 packet kernel (ops/pallas_bvh8.py) unions 128 rays per
    packet: 567 leaf clusters visited per packet = a ~380 ms/step dense
    Moller-Trumbore floor that no traversal trick removes.
  * Per-ray exact cluster-AABB culling finds only ~6 clusters per ray
    (~36 per 8-ray packet) — a 16x smaller MT workload — and the cull
    itself is dense, branch-free vector work XLA runs in a few ms.
  * In-kernel traversal pays ~350 ns per while-loop visit (scalar/sync
    bound); a data-dependent work-LIST processed by a dense batched
    kernel pays that tax once per 32 MT tiles instead of once per node.

The production path is the TWO-LEVEL pipeline (`_pipeline2`; one XLA +
three Pallas launches, jit-fused; 482 -> 130 ms on the 2^18-lane
cornell_dragon steady-state wavefront):

  L1 (XLA):     per-packet slab keys vs the scene's ~100 supernode boxes
                (maximal BVH subtrees of <= 128 leaf clusters, built by
                scene/compiler._supernodes) + top_k K1 -> near-ordered
                supernode slots.  The matrix is ~100 wide, not ~10k, so
                the top_k costs ~ms (a dense cluster-level top_k was
                measured a flat 252-324 ms regardless of k/dtype).
  A (Pallas):   per (packet, supernode slot): one (8 rays x 128
                clusters) slab tile, then an MXU-cumsum + packed
                rank-select (_rank_select4: no cross-lane data movement)
                emits <= KC candidate keys per block, each the global
                cluster id (block-major rows are near-ordered at
                supernode granularity; within a block selection keeps
                cluster-id order).
  L2 (Pallas):  block-dense compaction of each packet's (K1*KC-wide)
                candidate row -> prefix-dense slot list + count: chunk
                offsets from the counts via one static-selector MXU
                matmul, then a radix-4 digit-fixing concentrator
                (_route_radix4) — no width-wide cumsum, no top_k.
  MT (Pallas):  fixed-layout Moller-Trumbore: slot j of row p belongs to
                packet p, rays load/flush once per packet, one scalar
                branch per GRP slots skips the invalid tail; one native
                (8 x 128) tile per (packet, cluster) pair, running best
                kept as a full tile (no per-visit reductions).

`_pipeline` (dense single-level cull + top_k) remains as the fallback
for scenes whose cluster count exceeds the key embedding (2^14).

Correctness parity: identical hit rules to ops/pallas_bvh8.py /
ops/intersect.py (reference: mesh.rs:61-101; traversal order is
irrelevant to closest-hit semantics).  Rays are assumed pre-sorted by
the integrator's compaction key so 8-lane packets are coherent.

Capacity caveats — the pipeline is APPROXIMATE under overflow.  K1
supernode slots keep the nearest supernodes (top_k of entry-t); the KC
within-block cap and the PAIRS_PER_PACKET_CAP truncation keep entries in
supernode-granular near order only (the compaction is stable in lane
order: within a block, surviving clusters are id-ordered, not
t-ordered), so a dropped hit must hide behind a full cap of geometry
whose SUPERNODE entered no farther.  Measured on the 870k-tri benchmark
(8spp pool render): ~1.1% of packets touch a cap over the whole render
(the candidate-heavy mid-render wavefronts dominate), per-bounce id
agreement 0.9992-0.9997 vs the exact BVH8 walk, end-to-end radiance
lane agreement 0.9997 at depth 20 (bench.py image_parity).  Every
pipeline returns the overflowing packet count; callers surface it
(RenderMetrics wf_overflow) — set RRT_WF_CHECK=1 for an additional
per-call debug print.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8            # rays per packet (sublanes of an MT tile)
CLUSTER = 128    # triangles per cluster (lanes); == pallas_intersect.CLUSTER
PPG = 8          # packets per grid step
GRP = 16         # slots per skip-branch group (valid slots are a prefix of
                 # each packet's row, so one scalar branch skips GRP slots;
                 # scalar branches cost ~19 ns — fewer, coarser groups win
                 # for the ~33-valid-of-160 slot rows)
PAIRS_PER_PACKET_CAP = 128  # static slot capacity per packet.  Mean real
                            # pair count is ~33 on the 870k-tri benchmark;
                            # the prefix-skip makes slack slots nearly free.
                            # Sweep r4 (subtree supernodes, K1=40/KC=32):
                            # cap 128 -> 135 ms at id 0.99911 vs BVH8,
                            # cap 96 -> 134 ms at 0.99775 (too lossy)

BIG = 3.4e38
T_MIN_STATIC = 1e-3  # reference: camera.rs:294 interval lower bound


def _lane_iota():
    return lax.broadcasted_iota(jnp.int32, (R, 128), 1)


def _lane_extract(tile, c):
    """(R,128) tile, scalar lane c -> (R,1) column (one-hot reduce; Mosaic
    rejects non-128-aligned dynamic lane slices)."""
    return jnp.sum(jnp.where(_lane_iota() == c, tile, 0.0), axis=1,
                   keepdims=True)


def _make_mt_kernel(k: int):
    """Kernel factory: PPG packets per grid step, each with a fixed row of
    k cluster slots sorted near-to-far (valid slots a prefix of the row).

    The running best is a full (R, 128) TILE pair (t, id), not a reduced
    (R, 1) column: each slot then costs one elementwise compare/min — no
    per-slot lane reductions and no bank rotation (the r4 banked kernel
    paid min+argmin per visit; removing them measured 49.8 -> 35.9 ms on
    the candidate-heavy mid-render wavefront, bit-identical ids).  One
    reduction per packet at flush recovers (closest t, lowest id at that
    t).  A single scalar branch per GRP slots skips the invalid tail;
    every (g, column) of the output is written by exactly its own
    packet's flush, so no initialization pass is needed.
    """

    def kernel(cl_ref, cnt_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               tri_ref, t_out, i_out, bt_tile, bi_tile):
        i0 = pl.program_id(0) * PPG
        lane = _lane_iota()

        def do_packet(j):
            pk = i0 + j
            g = lax.div(pk, 128)
            c = lax.rem(pk, 128)
            o_x = _lane_extract(ox[g], c)
            o_y = _lane_extract(oy[g], c)
            o_z = _lane_extract(oz[g], c)
            d_x = _lane_extract(dx[g], c)
            d_y = _lane_extract(dy[g], c)
            d_z = _lane_extract(dz[g], c)
            tm = _lane_extract(tmax_ref[g], c)
            bt_tile[...] = jnp.broadcast_to(tm, (R, 128))
            bi_tile[...] = jnp.full((R, 128), -1, jnp.int32)
            n_j = cnt_ref[j, 0]

            for grp in range(-(-k // GRP)):
                @pl.when(grp * GRP < n_j)
                def _(grp=grp):
                    # group-local running best: read the scratch tiles
                    # once per group, update in registers, write back once
                    bt = bt_tile[...]
                    bi = bi_tile[...]
                    for s in range(min(GRP, k - grp * GRP)):
                        slot = grp * GRP + s
                        cl = cl_ref[j, slot]
                        # the last non-empty group can straddle the valid
                        # prefix: mask those lanes in vector code (cheaper
                        # than a scalar branch per slot)
                        live = slot < n_j
                        blk = tri_ref[cl]  # (GEOM_ROWS, 128) dynamic load
                        v0x = blk[0:1, :]
                        v0y = blk[1:2, :]
                        v0z = blk[2:3, :]
                        e1x = blk[3:4, :]
                        e1y = blk[4:5, :]
                        e1z = blk[5:6, :]
                        e2x = blk[6:7, :]
                        e2y = blk[7:8, :]
                        e2z = blk[8:9, :]
                        back = blk[9:10, :]
                        # Moller-Trumbore (reference: mesh.rs:61-101)
                        px = d_y * e2z - d_z * e2y
                        py = d_z * e2x - d_x * e2z
                        pz = d_x * e2y - d_y * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        dd = jnp.where(back > 0.5, jnp.abs(det), det)
                        ok = (dd > 1e-12) & live
                        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                        bx = o_x - v0x
                        by = o_y - v0y
                        bz = o_z - v0z
                        u = (bx * px + by * py + bz * pz) * inv_det
                        qx = by * e1z - bz * e1y
                        qy = bz * e1x - bx * e1z
                        qz = bx * e1y - by * e1x
                        w = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0)
                        ok &= (u + w <= 1.0)
                        ok &= (t > T_MIN_STATIC)
                        tt = jnp.where(ok, t, BIG)
                        better = tt < bt
                        bi = jnp.where(better, cl * CLUSTER + lane, bi)
                        bt = jnp.where(better, tt, bt)
                    bt_tile[...] = bt
                    bi_tile[...] = bi

            # one reduction per packet: closest t, lowest id at that t
            bt = bt_tile[...]
            bi = bi_tile[...]
            m = jnp.min(bt, axis=1, keepdims=True)
            idm = jnp.min(
                jnp.where((bt == m) & (bi >= 0), bi, 0x7FFFFFFF),
                axis=1, keepdims=True)
            idm = jnp.where(idm == 0x7FFFFFFF, -1, idm)
            onehot = lane == c
            t_out[g] = jnp.where(onehot, m, t_out[g])
            i_out[g] = jnp.where(onehot, idm, i_out[g])

        # two packets per fori iteration: the loop tax (~350 ns/iter) is
        # a measurable share of this fixed-cost-dominated kernel
        def pair_body(jj, _):
            do_packet(2 * jj)
            do_packet(2 * jj + 1)
            return 0

        lax.fori_loop(0, PPG // 2, pair_body, 0)

    return kernel


SN = 128   # clusters per supernode block (lane width of the L2 cull tile)
K1 = 40    # supernode slots per packet (L1 top_k width).  Sweep with
           # subtree supernodes (r4): K1=32 -> 128 ms at id 0.99899,
           # K1=40 -> 139 ms at 0.99920, K1=48 -> 140 ms at 0.99921
KC = 32    # compacted cluster slots per (packet, supernode block)
_ID_BITS = 14  # cluster id bits embedded in the candidate key (nc < 16384)


def _route_radix4(packed, width: int):
    """Radix-4 digit-fixing concentrator: route each valid element of a
    (rows, width) tile to its packed destination.  `packed` words hold
    (payload << 12) | (dest << 1) | valid; dest must be the compaction
    rank for valid elements and the own lane for invalid ones.

    Per stage, an element whose current base-4 digit differs from its
    destination digit moves by (dst_d - cur_d)*b lanes; compaction
    routes are conflict-free on this network (verified exhaustively for
    widths 128 and 2048 against a numpy oracle in .scratch/r5_radix4).
    Half the serial stages of the radix-2 butterfly — the stage chain is
    latency-bound, not op-bound.  All movement is static jnp.roll
    (Mosaic: lane slice + concat; also runs under interpret/CPU)."""
    lane = lax.broadcasted_iota(jnp.int32, packed.shape, 1)
    mask = width - 1
    b = 1
    while b < width:
        radix = 2 if b * 4 > width else 4
        dest_f = lax.shift_right_logical(packed, 1) & mask
        cur_d = (lane // b) % radix
        dst_d = (dest_f // b) % radix
        moving = ((packed & 1) > 0) & (dst_d != cur_d)
        out = jnp.where(moving, packed & ~1, packed)
        for dlt in range(1, radix):
            for sgn in (1, -1):
                p = jnp.roll(packed, sgn * dlt * b, axis=1)
                p_dest = lax.shift_right_logical(p, 1) & mask
                # the partner's own stage digit, rolled with the data so
                # wrapped lanes compare correctly (modular semantics)
                p_cur = jnp.roll(cur_d, sgn * dlt * b, axis=1)
                p_dst = (p_dest // b) % radix
                take = ((p & 1) > 0) & ((p_dst - p_cur) == sgn * dlt)
                out = jnp.where(take, p, out)
        packed = out
        b *= radix
    return packed


def _rank_select4(valid_i, tri_ref, kc: int):
    """Compact the set lanes of each (8, SN) mask row to a <= kc prefix of
    local lane ids, via MXU cumsum + packed rank-select — NO cross-lane
    data movement.

    The r4 butterfly compaction cost ~32 ms/step here: its 7-stage
    cumsum and 7-stage routing are SERIAL chains of cross-lane rolls
    (latency-bound; reducing roll count per stage measured no gain).
    Instead: ranks come from one (8,SN)x(SN,SN) upper-triangular matmul
    on the MXU (exact in f32 for counts <= 128), and slot j's lane id is
    recovered by a masked lane-reduction sum(lane+1 where rank == j+1) —
    kc independent reductions, 4 packed per i32 word (ids are 8-bit).
    Measured: kernel A 43.5 -> 19.9 ms, bit-identical output.

    Returns (ids (8, kc) i32 local lane ids with -1 invalid,
             cnt (8, 1) full per-row set count)."""
    n_lane = valid_i.shape[1]
    incl = lax.dot_general(
        valid_i.astype(jnp.float32), tri_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    cnt = incl[:, n_lane - 1:n_lane]
    sel = jnp.where(valid_i > 0, incl, 0)  # 1-based rank where valid
    vv = lax.broadcasted_iota(jnp.int32, valid_i.shape, 1) + 1  # 1..SN
    cols = []
    for j0 in range(0, kc, 4):
        acc = jnp.where(sel == j0 + 1, vv, 0)
        acc |= jnp.where(sel == j0 + 2, vv, 0) << 8
        acc |= jnp.where(sel == j0 + 3, vv, 0) << 16
        acc |= jnp.where(sel == j0 + 4, vv, 0) << 24
        s = jnp.sum(acc, axis=1, keepdims=True)
        for piece in range(4):
            cols.append((lax.shift_right_logical(s, 8 * piece) & 255) - 1)
    return jnp.concatenate(cols, axis=1), cnt


def _make_cull_kernel(k1: int, kc: int):
    """Kernel A of the two-level pipeline: for each packet, slab-test its
    K1 L1-selected supernode blocks (8 rays x 128 clusters per tile),
    rank-select the hit clusters of each block to KC slots, and emit the
    global cluster ids as candidate keys (the downstream compaction is
    stable, so candidates stay block-major: near-ordered at supernode
    granularity, id-ordered within a block — no gather needed to recover
    ids and no per-candidate t survives to the MT stage).
    """
    assert k1 % 8 == 0
    assert kc % 4 == 0

    def kernel(sn_ref, n1_ref, snst_ref, ox, oy, oz, dx, dy, dz, tmax_ref,
               bounds_ref, tri_ref, key_out, cnt_out, mrows, snrows):
        i0 = pl.program_id(0) * PPG

        def do_packet(j):
            g = lax.div(i0 + j, 128)
            c = lax.rem(i0 + j, 128)
            o_x = _lane_extract(ox[g], c)
            o_y = _lane_extract(oy[g], c)
            o_z = _lane_extract(oz[g], c)
            inv_x = 1.0 / _lane_extract(dx[g], c)
            inv_y = 1.0 / _lane_extract(dy[g], c)
            inv_z = 1.0 / _lane_extract(dz[g], c)
            tm = _lane_extract(tmax_ref[g], c)
            n1 = n1_ref[j, 0]

            # batches entirely beyond n1 are SKIPPED and their key_out /
            # cnt_out rows left as garbage: the downstream compaction
            # kernel masks lanes >= n1*KC and the overflow stat masks
            # slots >= n1, so uninitialized rows are never read as valid
            for batch in range(k1 // 8):
                @pl.when(batch * 8 < n1)
                def _(batch=batch):
                    # 8 supernode slots -> one (8, 128) any-hit tile
                    for s8 in range(8):
                        slot = batch * 8 + s8
                        sn = sn_ref[j, slot]
                        live = slot < n1
                        blk = bounds_ref[sn]      # (6, SN) dynamic load
                        sn_base = snst_ref[sn, 0]  # first cluster id
                        tx0 = (blk[0:1, :] - o_x) * inv_x   # (R, SN)
                        tx1 = (blk[3:4, :] - o_x) * inv_x
                        ty0 = (blk[1:2, :] - o_y) * inv_y
                        ty1 = (blk[4:5, :] - o_y) * inv_y
                        tz0 = (blk[2:3, :] - o_z) * inv_z
                        tz1 = (blk[5:6, :] - o_z) * inv_z
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1),
                                        T_MIN_STATIC),
                        )
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), tm),
                        )
                        hit = near <= far
                        anyhit = jnp.any(hit, axis=0, keepdims=True) & live
                        mrows[s8:s8 + 1, :] = anyhit.astype(jnp.int32)
                        snrows[s8:s8 + 1, :] = jnp.full(
                            (1, SN), sn_base, jnp.int32)

                    local, cnt8 = _rank_select4(mrows[...], tri_ref, kc)
                    # snrows is per-row constant: global id = block base
                    # + selected local id
                    key = jnp.where(
                        local >= 0, snrows[...][:, 0:1] + local, -1,
                    )
                    key_out[j, batch * 8:batch * 8 + 8, :] = key
                    cnt_out[j, batch * 8:batch * 8 + 8, :] = cnt8

        def pair_body(jj, _):
            do_packet(2 * jj)
            do_packet(2 * jj + 1)
            return 0

        lax.fori_loop(0, PPG // 2, pair_body, 0)

    return kernel


def _make_compact_kernel(width: int, k: int, k1: int, kc: int):
    """Block-dense candidate compaction: kernel A's output rows are k1
    chunks of kc slots whose valid keys are a PREFIX of each chunk, so
    per-chunk lane destinations come straight from the chunk counts —
    no width-wide cumsum chain.  One static-selector MXU matmul
    replicates the exclusive prefix of the clamped counts to every lane
    (off_rep[r, l] = sum of counts of chunks before chunk(l)), then the
    radix-4 concentrator routes each chunk prefix to its packet-dense
    position.  6 serial stages vs the old radix-2 butterfly's 11+11
    (measured ~10 -> ~5 ms on the 870k-tri bench)."""

    shift = (width - 1).bit_length() + 1  # dest bits + valid bit

    def kernel(keys_ref, cnt_ref, n1_ref, cum_ref, out_ref, cnt_out):
        lane = lax.broadcasted_iota(jnp.int32, (8, width), 1)
        chunk = lane // kc          # static pattern
        pos = lane - chunk * kc
        keys = keys_ref[...]
        n1 = n1_ref[...]            # (8, 1)
        valid = ((keys >= 0) & (chunk < n1)).astype(jnp.int32)
        kidx = lax.broadcasted_iota(jnp.int32, (8, k1), 1)
        c = jnp.where(kidx < n1, jnp.minimum(cnt_ref[...], kc), 0)
        off_rep = lax.dot_general(
            c.astype(jnp.float32), cum_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        total = jnp.sum(c, axis=1, keepdims=True)
        dest = jnp.where(valid > 0, off_rep + pos, lane)
        packed = ((jnp.where(valid > 0, keys, 0) << shift)
                  | (dest << 1) | valid)
        packed = _route_radix4(packed, width)
        out_ref[...] = jnp.where(
            (packed[:, :k] & 1) > 0,
            lax.shift_right_logical(packed[:, :k], shift), -1,
        )
        cnt_out[...] = total  # unclamped: the caller detects cap overflow

    return kernel


def _compact_candidates(keys, blk_cnt, n1, k, interpret):
    """(n_pk, k1, KC) block-prefix-dense keys + per-block counts ->
    (cl (n_pk, k), cnt (n_pk,) unclamped) via the block-dense compaction
    kernel; the row is padded to a power of two for the radix network."""
    n_pk, k1, kc = keys.shape
    w = k1 * kc
    w2 = 1 << (w - 1).bit_length()
    keys_flat = keys.reshape(n_pk, w)
    if w2 != w:
        keys_flat = jnp.pad(keys_flat, ((0, 0), (0, w2 - w)),
                            constant_values=-1)
    # static selector: CUM[c, l] = 1 iff chunk c precedes lane l's chunk
    cum = (lax.broadcasted_iota(jnp.int32, (k1, w2), 0)
           < (lax.broadcasted_iota(jnp.int32, (k1, w2), 1) // kc)
           ).astype(jnp.float32)
    out, cnt = pl.pallas_call(
        _make_compact_kernel(w2, k, k1, kc),
        grid=(n_pk // 8,),
        in_specs=[pl.BlockSpec((8, w2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, k1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k1, w2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((8, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pk, k), jnp.int32),
            jax.ShapeDtypeStruct((n_pk, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(keys_flat, blk_cnt, n1[:, None], cum)
    return out, cnt[:, 0]


def _to_groups(a):
    """(N,) -> (G, R, 128): [g, r, c] = a[(g*128 + c)*R + r]."""
    return jnp.transpose(a.reshape(-1, 128, R), (0, 2, 1))


def _from_groups(a):
    return jnp.transpose(a, (0, 2, 1)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pipeline(cl_lo, cl_hi, tri_geom, org, dirn, t_max, *, interpret):
    """org/dirn (N,3), t_max (N,) with N a multiple of 128*R.
    Returns (t, slot, n_pairs) in caller lane order."""
    n = org.shape[0]
    n_pk = n // R
    nc = cl_lo.shape[0]

    # ---- 1. dense per-ray cull, reduced to packets (XLA) ----
    # Chunked over ray blocks via lax.map so the (block, nc, 3) slab
    # intermediates stay bounded regardless of XLA fusion decisions
    # (the full (N, nc) f32 intermediates would be ~10 GB).
    cull_block = 8192 if n % 8192 == 0 else 128 * R
    nb = n // cull_block

    def _cull(args):
        o_b, d_b, tm_b = args
        inv = 1.0 / d_b
        # per-axis (block, nc) arrays keep the cluster axis minor — a
        # single (block, nc, 3) broadcast would put the 3-vector on the
        # minor dim (3/128 lane occupancy, measured ~7x slower pipeline)
        near = jnp.full((o_b.shape[0], nc), T_MIN_STATIC, jnp.float32)
        far = jnp.broadcast_to(tm_b[:, None], (o_b.shape[0], nc))
        for ax in range(3):
            t0 = (cl_lo[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            t1 = (cl_hi[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = near <= far
        # per-packet sort key: monotone int encoding of the packet-min
        # slab entry t (IEEE positive floats order as their int bits), -1
        # where no ray in the packet hits the cluster.  top_k of the key
        # = the packet's clusters sorted near-to-far.
        tent = jnp.min(
            jnp.where(hit, near, jnp.inf).reshape(-1, R, nc), axis=1
        )
        key = jnp.where(
            jnp.isfinite(tent),
            jnp.int32(0x7FFFFFFF)
            - lax.bitcast_convert_type(tent, jnp.int32),
            jnp.int32(-1),
        )
        return key

    pk_key = lax.map(
        _cull,
        (org.reshape(nb, cull_block, 3), dirn.reshape(nb, cull_block, 3),
         t_max.reshape(nb, cull_block)),
    ).reshape(n_pk, nc)
    pk_cnt = jnp.sum(pk_key >= 0, axis=1, dtype=jnp.int32)

    # ---- 2. packet-major pair extraction ----
    # Row-wise top_k of the key matrix -> per-packet padded slot rows,
    # nearest cluster first.  (Alternatives measured in-context on TPU and
    # rejected: jnp.nonzero 2.9 s; cumsum + binary-search take_along_axis
    # gathers ~1.1 s — minor-axis element gathers are ~0.2 GB/s.)
    k = min(PAIRS_PER_PACKET_CAP, nc)
    top, top_cl = lax.top_k(pk_key, k)                  # (P, k) descending
    cl = jnp.where(top >= 0, top_cl, 0)                 # (P, k)
    cnt = jnp.minimum(pk_cnt, k)                        # (P,)
    n_pairs = jnp.sum(cnt, dtype=jnp.int32)
    n_overflow = jnp.sum(pk_cnt > k, dtype=jnp.int32)

    # ---- 3. batched MT over the fixed (packet, slot) layout (Pallas) ----
    t, slot = _mt_call(cl, cnt, tri_geom, org, dirn, t_max, k, interpret)
    return t, slot, n_pairs, n_overflow


def _mt_call(cl, cnt, tri_geom, org, dirn, t_max, k, interpret):
    """Shared MT-kernel invocation: (cl, cnt) fixed slot layout -> (t, slot)
    in group layout, returned flattened to caller lane order."""
    # only rows 0-9 (v0/e1/e2/hit_back) are used: slicing shrinks both the
    # VMEM residency (81 -> 51 MB on the 870k-tri bench) and every
    # per-slot dynamic block load
    tri_geom = tri_geom[:, :10, :]
    rays_g = [
        _to_groups(org[:, 0]), _to_groups(org[:, 1]), _to_groups(org[:, 2]),
        _to_groups(dirn[:, 0]), _to_groups(dirn[:, 1]), _to_groups(dirn[:, 2]),
    ]
    tmax_g = _to_groups(jnp.minimum(t_max, BIG))
    G = rays_g[0].shape[0]
    n_pk = org.shape[0] // R
    cl_spec = pl.BlockSpec((PPG, k), lambda i: (i, 0),
                           memory_space=pltpu.SMEM)
    # rank-1 SMEM blocks must be 128-multiples; a (PPG, 1) column is not
    cnt_spec = pl.BlockSpec((PPG, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)
    fullc = pl.BlockSpec((G, R, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(tri_geom.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    t, slot = pl.pallas_call(
        _make_mt_kernel(k),
        grid=(n_pk // PPG,),
        in_specs=[cl_spec, cnt_spec] + [fullc] * 7 + [tri_spec],
        out_specs=[fullc, fullc],
        out_shape=[
            jax.ShapeDtypeStruct((G, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cl, cnt[:, None], *rays_g, tmax_g, tri_geom)
    return _from_groups(t), _from_groups(slot)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pipeline2(sn_lo, sn_hi, sn_start, sn_bounds, tri_geom, org, dirn,
               t_max, *, interpret):
    """Two-level cull -> compact -> MT pipeline (v3).

    The dense _pipeline pays ~0.78 ns per (packet, cluster) in lax.top_k
    alone — 252 ms on the 870k-tri bench.  Here the per-cluster work only
    happens for the ~K1 supernode blocks each packet actually overlaps:

      L1 (XLA):      slab keys vs S = nc/128 supernode boxes, top_k K1
                     -> per-packet near-ordered supernode slots (cheap:
                     the matrix is 78 wide, not 9918).
      A  (Pallas):   per (packet, supernode slot): one (8 x 128) slab
                     tile, then an in-register rank-select (MXU cumsum +
                     masked reductions) emits <= KC global cluster ids.
      L2 (Pallas):   stable butterfly compaction of the (n_pk, K1*KC)
                     candidate rows -> the MT kernel's fixed slot rows
                     (block-major: near-ordered at supernode granularity
                     only); no gathers, no top_k.
      MT (Pallas):   unchanged.

    Requires nc < 2**_ID_BITS (the id embedding); the dispatch falls back
    to the dense pipeline above that.  The supernode tables come from the
    scene compiler (scene/compiler.py _supernodes): maximal preorder BVH
    subtrees of <= 128 leaf clusters — TIGHT boxes with contiguous
    cluster ranges; sn_bounds pads unused lanes with +BIG point boxes
    (an inverted lo > hi "empty" box would pass the orientation-agnostic
    slab test for every ray).
    """
    n = org.shape[0]
    n_pk = n // R
    S = sn_lo.shape[0]
    k1 = min(K1, -(-S // 8) * 8)
    bounds = sn_bounds                                  # (S, 6, SN)

    # ---- L1: per-packet supernode keys (XLA; tiny matrix) ----
    # wide chunks: the per-chunk (block, S) intermediates are small at
    # supernode granularity, and fewer lax.map steps cost less wall time
    cull_block = 65536 if n % 65536 == 0 else (
        8192 if n % 8192 == 0 else 128 * R)
    nb = n // cull_block

    def _cull1(args):
        o_b, d_b, tm_b = args
        inv = 1.0 / d_b
        near = jnp.full((o_b.shape[0], S), T_MIN_STATIC, jnp.float32)
        far = jnp.broadcast_to(tm_b[:, None], (o_b.shape[0], S))
        for ax in range(3):
            t0 = (sn_lo[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            t1 = (sn_hi[None, :, ax] - o_b[:, ax, None]) * inv[:, ax, None]
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = near <= far
        tent = jnp.min(
            jnp.where(hit, near, jnp.inf).reshape(-1, R, S), axis=1
        )
        return jnp.where(
            jnp.isfinite(tent),
            jnp.int32(0x7FFFFFFF) - lax.bitcast_convert_type(tent, jnp.int32),
            jnp.int32(-1),
        )

    key1 = lax.map(
        _cull1,
        (org.reshape(nb, cull_block, 3), dirn.reshape(nb, cull_block, 3),
         t_max.reshape(nb, cull_block)),
    ).reshape(n_pk, S)
    if S < k1:
        key1 = jnp.pad(key1, ((0, 0), (0, k1 - S)), constant_values=-1)
    top1, sn_slot = lax.top_k(key1, k1)                 # (n_pk, k1)
    l1_cnt = jnp.sum(key1 >= 0, axis=1, dtype=jnp.int32)
    n1 = jnp.minimum(l1_cnt, k1)
    sn_slot = jnp.where(top1 >= 0, sn_slot, 0)

    # ---- kernel A: block cull + lane compaction ----
    rays_g = [
        _to_groups(org[:, 0]), _to_groups(org[:, 1]), _to_groups(org[:, 2]),
        _to_groups(dirn[:, 0]), _to_groups(dirn[:, 1]), _to_groups(dirn[:, 2]),
    ]
    tmax_g = _to_groups(jnp.minimum(t_max, BIG))
    G = rays_g[0].shape[0]
    sn_spec = pl.BlockSpec((PPG, k1), lambda i: (i, 0),
                           memory_space=pltpu.SMEM)
    n1_spec = pl.BlockSpec((PPG, 1), lambda i: (i, 0),
                           memory_space=pltpu.SMEM)
    snst_spec = pl.BlockSpec((S, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    fullc = pl.BlockSpec((G, R, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bounds_spec = pl.BlockSpec(bounds.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    # upper-triangular ones for the rank-select cumsum matmul
    tri = (lax.broadcasted_iota(jnp.int32, (SN, SN), 0)
           <= lax.broadcasted_iota(jnp.int32, (SN, SN), 1)
           ).astype(jnp.float32)
    tri_spec = pl.BlockSpec((SN, SN), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    keys, blk_cnt = pl.pallas_call(
        _make_cull_kernel(k1, KC),
        grid=(n_pk // PPG,),
        in_specs=([sn_spec, n1_spec, snst_spec] + [fullc] * 7
                  + [bounds_spec, tri_spec]),
        out_specs=[
            pl.BlockSpec((PPG, k1, KC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPG, k1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pk, k1, KC), jnp.int32),
            jax.ShapeDtypeStruct((n_pk, k1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, SN), jnp.int32),
            pltpu.VMEM((8, SN), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sn_slot, n1[:, None], sn_start[:, None], *rays_g, tmax_g, bounds,
      tri)

    # ---- L2: compaction of the candidate matrix (Pallas butterfly) ----
    k = min(PAIRS_PER_PACKET_CAP, k1 * KC)
    top, real = _compact_candidates(keys, blk_cnt[:, :, 0], n1, k,
                                    interpret)
    cl = jnp.where(top >= 0, top, 0)
    cnt = jnp.minimum(real, k)
    n_pairs = jnp.sum(cnt, dtype=jnp.int32)
    slot_live = lax.broadcasted_iota(jnp.int32, (n_pk, k1), 1) < n1[:, None]
    dropped = (
        (l1_cnt > k1) | (real > k)
        | jnp.any((blk_cnt[:, :, 0] > KC) & slot_live, axis=1)
    )
    n_overflow = jnp.sum(dropped, dtype=jnp.int32)

    t, slot = _mt_call(cl, cnt, tri_geom, org, dirn, t_max, k, interpret)
    return t, slot, n_pairs, n_overflow


def intersect_triangles_wavefront(pack, org, dirn, t_min, t_max,
                                  interpret: bool = False,
                                  return_overflow: bool = False):
    """Closest triangle hit via the cull->MT pipeline.  Drop-in for
    ops.pallas_bvh8.intersect_triangles_bvh8 (same contract: returns
    (t, slot) with t == t_max where nothing was hit; t_min is the static
    T_MIN).  Rays should be compaction-sorted for speed (not required
    for correctness).

    APPROXIMATE under capacity overflow (see the module docstring): a
    packet with more candidate work than K1/KC/PAIRS_PER_PACKET_CAP can
    drop real hits.  With return_overflow=True the return is
    (t, slot, n_overflow) where n_overflow is the number of packets that
    hit any cap this call — callers surface it (RenderMetrics).  Set
    RRT_WF_CHECK=1 for an additional per-call debug print."""
    import os

    n = org.shape[0]
    if pack.tri_geom.shape[0] == 0 or pack.wf_cl_lo.shape[0] == 0:
        if return_overflow:
            return t_max, jnp.full((n,), -1, jnp.int32), jnp.int32(0)
        return t_max, jnp.full((n,), -1, jnp.int32)

    group = 128 * R
    n_pad = -(-n // group) * group
    if n_pad != n:
        padn = n_pad - n
        org = jnp.concatenate([org, jnp.ones((padn, 3), org.dtype)], 0)
        dirn = jnp.concatenate([dirn, jnp.ones((padn, 3), org.dtype)], 0)
        t_max = jnp.concatenate([t_max, jnp.zeros((padn,), t_max.dtype)], 0)

    from .intersect import call_detached

    # two-level pipeline when the cluster ids fit the key embedding and
    # the compiler built supernode tables; dense pipeline otherwise
    if (pack.wf_cl_lo.shape[0] < (1 << _ID_BITS)
            and pack.wf_sn_lo.shape[0] > 0):
        t, slot, _, n_overflow = call_detached(
            functools.partial(_pipeline2, interpret=interpret),
            pack.wf_sn_lo, pack.wf_sn_hi, pack.wf_sn_start,
            pack.wf_sn_bounds, pack.tri_geom,
            org.astype(jnp.float32), dirn.astype(jnp.float32),
            t_max.astype(jnp.float32),
        )
    else:
        t, slot, _, n_overflow = call_detached(
            functools.partial(_pipeline, interpret=interpret),
            pack.wf_cl_lo, pack.wf_cl_hi, pack.tri_geom,
            org.astype(jnp.float32), dirn.astype(jnp.float32),
            t_max.astype(jnp.float32),
        )
    if os.environ.get("RRT_WF_CHECK"):
        jax.debug.print(
            "wavefront: {n} packet(s) overflowed PAIRS_PER_PACKET_CAP "
            "(farthest clusters dropped)", n=n_overflow,
        )
    t = t[:n]
    slot = slot[:n]
    miss = slot < 0
    t = jnp.where(miss, jnp.asarray(t_max[:n], jnp.float32), t)
    if return_overflow:
        return t, slot, n_overflow
    return t, slot
