"""Evaluate compaction keys on REAL bounce wavefronts: BVH8 leaf counters."""
import time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc

scene = models.build("cornell_dragon")
pack, _ = sc.compile_scene(scene)
import importlib.util
spec = importlib.util.spec_from_file_location("pc", "/root/repo/.scratch/probe_bvh8_counts.py")

# reuse the instrumented traverse from probe_bvh8_counts by exec'ing its kernel part
src = open("/root/repo/.scratch/probe_bvh8_counts.py").read()
kernel_src = src.split("from rust_raytracer_tpu import models")[0]
exec(kernel_src)

d = np.load("/root/repo/.scratch/wavefronts.npz")

def expand8(v):
    v = (v | (v << np.uint32(16))) & np.uint32(0x030000FF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x0300F00F)
    v = (v | (v << np.uint32(4))) & np.uint32(0x030C30C3)
    v = (v | (v << np.uint32(2))) & np.uint32(0x09249249)
    return v

def morton24(org):
    lo = org.min(0); span = np.maximum(org.max(0) - lo, 1e-20)
    q = np.clip((org - lo) / span * 255.0, 0, 255).astype(np.uint32)
    return (expand8(q[:,0]) << np.uint32(2)) | (expand8(q[:,1]) << np.uint32(1)) | expand8(q[:,2])

def octant(dirn):
    return ((dirn[:,0]<0).astype(np.uint32)*4 + (dirn[:,1]<0).astype(np.uint32)*2 + (dirn[:,2]<0).astype(np.uint32))

def dirbits(dirn, bits=2):
    # quantize direction beyond octant: |x|,|y|,|z| relative magnitudes
    a = np.abs(dirn); a = a / np.maximum(a.sum(1, keepdims=True), 1e-20)
    q = np.clip((a[:, :2] * ((1<<bits)-1)).astype(np.uint32), 0, (1<<bits)-1)
    return q[:,0] << np.uint32(bits) | q[:,1]

def key_current(org, dirn):
    return (octant(dirn) << np.uint32(28)) | morton24(org)

def key_morton_major(org, dirn):
    m = morton24(org)
    return (m << np.uint32(3)) | octant(dirn)  # low bits of m drop off top? keep 28 bits
def key_dir5(org, dirn):
    return (octant(dirn) << np.uint32(28)) | (dirbits(dirn,2) << np.uint32(24)) | (morton24(org) >> np.uint32(0)) & np.uint32(0xFFFFFF) | (dirbits(dirn,2) << np.uint32(24))
def key_dir_fine(org, dirn):
    return (octant(dirn) << np.uint32(28)) | (dirbits(dirn, 3) << np.uint32(22)) | (morton24(org) >> np.uint32(2))
def key_interleave(org, dirn):
    # 6D-ish: octant top, then morton with dir bits woven at mid level
    m = morton24(org)
    db = dirbits(dirn, 3)
    return (octant(dirn) << np.uint32(28)) | ((m >> np.uint32(12)) << np.uint32(16)) | (db << np.uint32(10)) | ((m >> np.uint32(2)) & np.uint32(0x3FF))

KEYS = {"current(oct,mort24)": key_current,
        "morton-major": key_morton_major,
        "oct+dir3+mort": key_dir_fine,
        "oct+mortHI+dir+mortLO": key_interleave}

JT = jax.jit(lambda o, dd, tm: jnp.sum(traverse(pack.bvh8_aabb, pack.bvh8_child, pack.tri_geom, o, dd, tm)[0]))

def run(depth):
    org = d[f"o{depth}"]; dirn = d[f"d{depth}"]; al = d[f"a{depth}"]
    N = org.shape[0]
    t_max = jnp.asarray(np.where(al, np.inf, 0.0).astype(np.float32))
    print(f"--- depth {depth} (alive {al.mean()*100:.0f}%)")
    for name, kf in KEYS.items():
        key = kf(org, dirn).astype(np.uint32)
        key = np.where(al, key, np.uint32(0xFFFFFFFF))
        k = np.argsort(key)
        o2, d2, tm = jnp.asarray(org[k]), jnp.asarray(dirn[k]), jnp.asarray(np.asarray(t_max)[k])
        out = traverse(pack.bvh8_aabb, pack.bvh8_child, pack.tri_geom, o2, d2, tm)
        p = np.asarray(out[2])[:,0].astype(np.float64); l = np.asarray(out[3])[:,0].astype(np.float64)
        _ = np.asarray(JT(o2, d2, tm))
        t0 = time.time(); reps = 3
        for _ in range(reps): r = np.asarray(JT(o2, d2, tm))
        dt = (time.time()-t0)/reps - 0.025
        print(f"  {name:26s}: pops {p.mean():6.0f} leaves {l.mean():6.0f}  {dt*1e3:5.0f} ms  {N/dt/1e6:.2f} Mrays/s")

run(1)
run(3)
run(6)
