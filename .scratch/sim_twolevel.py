"""CPU simulator for the two-level (supernode -> cluster) traversal:
estimates, on the real steady-state wavefront, the per-8-ray-packet
counts of (a) supernode frustum hits H, (b) cluster frustum hits L
(conservative interval test, wall-bounded tmax), vs (c) the exact
per-ray cluster AABB hit count.  Decides whether the 2-sync kernel
design can reach the target.

Run with JAX_PLATFORMS=cpu.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import time
import numpy as np
import jax.numpy as jnp

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.render import integrator as integ

SUPER = 128  # clusters per supernode

t0 = time.time()
scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
print(f"build {time.time()-t0:.1f}s", flush=True)

tg = np.asarray(pack.tri_geom)  # (nc, 16, 128)
nc = tg.shape[0]
v0 = tg[:, 0:3, :]
e1 = tg[:, 3:6, :]
e2 = tg[:, 6:9, :]
valid = (np.abs(v0).sum(1) + np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
p0 = v0
p1 = v0 + e1
p2 = v0 + e2
big = 3.4e38


def masked_minmax(p, valid):
    lo = np.where(valid[:, None, :], p, big).min(2)
    hi = np.where(valid[:, None, :], p, -big).max(2)
    return lo, hi


cl_lo = np.minimum(np.minimum(masked_minmax(p0, valid)[0],
                              masked_minmax(p1, valid)[0]),
                   masked_minmax(p2, valid)[0])  # (nc, 3)
cl_hi = np.maximum(np.maximum(masked_minmax(p0, valid)[1],
                              masked_minmax(p1, valid)[1]),
                   masked_minmax(p2, valid)[1])
empty = ~valid.any(1)
cl_lo[empty] = big
cl_hi[empty] = -big

ns = -(-nc // SUPER)
pad = ns * SUPER - nc
sp_lo = np.concatenate([cl_lo, np.full((pad, 3), big)]).reshape(ns, SUPER, 3).min(1)
sp_hi = np.concatenate([cl_hi, np.full((pad, 3), -big)]).reshape(ns, SUPER, 3).max(1)
print(f"clusters={nc} supernodes={ns}", flush=True)

d = np.load("/root/repo/.scratch/steady_state.npz")
org0, dirn0, alive0 = d["org"], d["dirn"], d["alive"]

# wall-bounded tmax: nearest plane/sphere hit per ray (cheap jnp on cpu)
from rust_raytracer_tpu.ops import intersect as isect
t_min = jnp.full((org0.shape[0],), 1e-3, jnp.float32)
inf = jnp.full((org0.shape[0],), np.inf, jnp.float32)
t_sph, _ = isect.intersect_spheres(pack, jnp.asarray(org0), jnp.asarray(dirn0), t_min, inf)
t_pln, _ = isect.intersect_planes(pack, jnp.asarray(org0), jnp.asarray(dirn0), t_min, inf)
tmax0 = np.asarray(jnp.minimum(t_sph, t_pln))
tmax0 = np.where(np.isfinite(tmax0), tmax0, 1e30)
tmax0 = np.where(alive0, tmax0, 0.0).astype(np.float32)


def slab_rays(org, dirn, tmax, boxes_lo, boxes_hi):
    """exact per-ray AABB hits: (R,3) rays x (B,3) boxes -> (R,B) bool."""
    inv = 1.0 / dirn
    t0 = (boxes_lo[None] - org[:, None]) * inv[:, None]
    t1 = (boxes_hi[None] - org[:, None]) * inv[:, None]
    near = np.minimum(t0, t1).max(2)
    far = np.maximum(t0, t1).min(2)
    return (near <= far) & (far > 1e-3) & (near < tmax[:, None])


def interval_slab(o8, d8, tmax8, boxes_lo, boxes_hi):
    """conservative packet test: interval bounds over 8 rays -> (B,) bool."""
    inv = 1.0 / d8
    o_lo, o_hi = o8.min(0), o8.max(0)
    i_lo, i_hi = inv.min(0), inv.max(0)
    tm = tmax8.max()

    outs_near = np.full(boxes_lo.shape[0], -np.inf)
    outs_far = np.full(boxes_lo.shape[0], np.inf)
    for ax in range(3):
        # interval products (blo - o) * inv and (bhi - o) * inv
        a_lo = boxes_lo[:, ax] - o_hi[ax]
        a_hi = boxes_lo[:, ax] - o_lo[ax]
        b_lo = boxes_hi[:, ax] - o_hi[ax]
        b_hi = boxes_hi[:, ax] - o_lo[ax]
        cands = np.stack([a_lo * i_lo[ax], a_lo * i_hi[ax],
                          a_hi * i_lo[ax], a_hi * i_hi[ax],
                          b_lo * i_lo[ax], b_lo * i_hi[ax],
                          b_hi * i_lo[ax], b_hi * i_hi[ax]])
        # per-axis entry interval: conservative near_min = min over rays of
        # per-ray near_ax; with intervals: near_ax >= min(all candidates),
        # far_ax <= max(all candidates)
        outs_near = np.maximum(outs_near, cands.min(0))
        outs_far = np.minimum(outs_far, cands.max(0))
    return (outs_near <= outs_far) & (outs_far > 1e-3) & (outs_near < tm)


def key_custom(org, dirn, alive, dir_bits, morton_hi_bits):
    u32 = np.uint32
    dead = np.where(alive, u32(0), u32(1))
    octant = ((dirn[:, 0] < 0).astype(u32) * u32(4)
              + (dirn[:, 1] < 0).astype(u32) * u32(2)
              + (dirn[:, 2] < 0).astype(u32))
    lo = org.min(0); span = np.maximum(org.max(0) - lo, 1e-20)
    q = np.clip((org - lo) / span * 255.0, 0.0, 255.0).astype(u32)
    def expand(v):
        v = (v | (v << u32(16))) & u32(0x030000FF)
        v = (v | (v << u32(8))) & u32(0x0300F00F)
        v = (v | (v << u32(4))) & u32(0x030C30C3)
        v = (v | (v << u32(2))) & u32(0x09249249)
        return v
    morton = ((expand(q[:, 0]) << u32(2)) | (expand(q[:, 1]) << u32(1))
              | expand(q[:, 2]))
    a = np.abs(dirn); a = a / np.maximum(a.sum(1, keepdims=True), 1e-20)
    top = u32((1 << dir_bits) - 1) if dir_bits else u32(0)
    qx = np.clip((a[:, 0] * top).astype(u32), 0, top)
    qy = np.clip((a[:, 1] * top).astype(u32), 0, top)
    key = dead.astype(np.uint64) << 40
    pos = 40
    mh = (morton >> u32(24 - morton_hi_bits)).astype(np.uint64) if morton_hi_bits else 0
    pos -= morton_hi_bits
    key = key | (mh << pos)
    pos -= 3
    key = key | (octant.astype(np.uint64) << pos)
    pos -= 2 * dir_bits
    if dir_bits:
        key = key | (qx.astype(np.uint64) << (pos + dir_bits)) | (qy.astype(np.uint64) << pos)
    ml = (morton & ((1 << (24 - morton_hi_bits)) - 1)).astype(np.uint64) if morton_hi_bits else morton.astype(np.uint64)
    key = key | (ml if pos >= 24 else (ml >> (24 - max(pos, 0))))
    return key


for label, key_fn in [
    ("prod key (oct|dir3|morton)",
     lambda o, dd, a: np.asarray(integ._compaction_key(jnp.asarray(o), jnp.asarray(dd), jnp.asarray(a)))),
    ("morton24-first",
     lambda o, dd, a: key_custom(o, dd, a, 0, 24)),
    ("morton12 | oct | dir3",
     lambda o, dd, a: key_custom(o, dd, a, 3, 12)),
    ("morton18 | oct",
     lambda o, dd, a: key_custom(o, dd, a, 0, 18)),
]:
    key = key_fn(org0, dirn0, alive0)
    perm = np.argsort(key, kind="stable")
    org, dirn, alive, tmax = org0[perm], dirn0[perm], alive0[perm], tmax0[perm]

    rng = np.random.default_rng(0)
    n_pk = 1500
    pks = rng.choice(org.shape[0] // 8, n_pk, replace=False)
    Hs, Ls, Ex, Sup_ex = [], [], [], []
    for p in pks:
        sl = slice(p * 8, p * 8 + 8)
        o8, d8, t8 = org[sl], dirn[sl], tmax[sl]
        if not alive[sl].any():
            continue
        t8 = np.where(alive[sl], t8, 0.0)
        sup_hit = interval_slab(o8, d8, t8, sp_lo, sp_hi)
        H = int(sup_hit.sum())
        # clusters of hit supernodes, conservative
        cl_ids = np.concatenate([
            np.arange(s * SUPER, min((s + 1) * SUPER, nc))
            for s in np.nonzero(sup_hit)[0]
        ]) if H else np.zeros((0,), int)
        if len(cl_ids):
            cl_hit = interval_slab(o8, d8, t8, cl_lo[cl_ids], cl_hi[cl_ids])
            L = int(cl_hit.sum())
        else:
            L = 0
        # exact per-ray cluster hits (union over the 8 rays)
        ex = slab_rays(o8, d8, t8, cl_lo, cl_hi)
        sup_ex = slab_rays(o8, d8, t8, sp_lo, sp_hi)
        Ex.append(int(ex.any(0).sum()))
        Sup_ex.append(int(sup_ex.any(0).sum()))
        Hs.append(float(sup_ex.sum(1).mean()))  # per-ray supernode hits
        Ls.append(float(ex.sum(1).mean()))      # per-ray cluster hits

    Hs, Ls, Ex, Sup_ex = map(np.array, (Hs, Ls, Ex, Sup_ex))
    print(f"{label}: packets={len(Hs)}")
    print(f"  supernode: per-ray {Hs.mean():.1f} | packet-union {Sup_ex.mean():.1f} p95 {np.percentile(Sup_ex,95):.0f}")
    print(f"  cluster:   per-ray {Ls.mean():.1f} | packet-union {Ex.mean():.1f} p95 {np.percentile(Ex,95):.0f}", flush=True)
