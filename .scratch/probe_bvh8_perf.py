import os, time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8

t0=time.time()
scene = models.build("cornell_dragon")
pack, _ = sc.compile_scene(scene)
print(f"build {time.time()-t0:.1f}s tris={pack.tri_v0.shape[0]} clusters={pack.tri_geom.shape[0]} n8={pack.bvh8_child.shape[0]} geomMB={(pack.tri_geom.size+pack.bvh8_aabb.size+pack.bvh8_child.size)*4/1e6:.1f}")

N = 1 << 17
rng = np.random.default_rng(0)
t_max = jnp.full((N,), np.inf, jnp.float32)

def run(org, dirn, label):
    orgj, dirj = jnp.asarray(org), jnp.asarray(dirn)
    out = pb8.intersect_triangles_bvh8(pack, orgj, dirj, 1e-3, t_max)
    _ = np.asarray(out[0])
    t0 = time.time(); reps=3
    for _ in range(reps):
        out = pb8.intersect_triangles_bvh8(pack, orgj, dirj, 1e-3, t_max)
        r = np.asarray(out[0])
    dt = (time.time()-t0)/reps
    print(f"{label}: {dt*1e3:.0f} ms -> {N/dt/1e6:.2f} M rays/s")

# coherent: camera-like frustum
org = np.tile(np.array([278,278,-800], np.float32), (N,1))
px = rng.uniform(0,555,(N,)); py = rng.uniform(0,555,(N,))
dirn = np.stack([px-278, py-278, np.full((N,),800.0)],-1).astype(np.float32)
k = np.lexsort((py//8, px//8))
run(org[k], dirn[k], "coh-sorted")

# incoherent unsorted
org2 = rng.uniform(0,555,(N,3)).astype(np.float32)
dirn2 = rng.normal(size=(N,3)).astype(np.float32)
run(org2, dirn2, "incoh-unsorted")

# incoherent with the integrator's (octant, morton) sort
from rust_raytracer_tpu.render.integrator import _compaction_key
key = np.asarray(_compaction_key(jnp.asarray(org2), jnp.asarray(dirn2), jnp.ones((N,), bool)))
k2 = np.argsort(key)
run(org2[k2], dirn2[k2], "incoh-sorted")
