"""Quick correctness + perf check of the BVH8 kernel vs jnp oracle."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8

scene = models.build(os.environ.get("SCENE", "light_test"))
t0 = time.time()
pack, _ = sc.compile_scene(scene)
print(f"scene build {time.time()-t0:.1f}s  tris={pack.tri_v0.shape[0]} "
      f"clusters={pack.tri_geom.shape[0]} n8={pack.bvh8_child.shape[0]} "
      f"geomMB={(pack.tri_geom.size + pack.bvh8_aabb.size)*4/1e6:.1f}")

N = 1 << 14
rng = np.random.default_rng(0)
lo = np.asarray(pack.bvh8_aabb[0, :, 0:3]).min(0)
hi = np.asarray(pack.bvh8_aabb[0, :, 3:6]).max(0)
ctr, span = (lo + hi) / 2, (hi - lo)
org = (ctr + (rng.uniform(-1.2, 1.2, (N, 3))) * span).astype(np.float32)
dirn = rng.normal(size=(N, 3)).astype(np.float32)
t_max = jnp.full((N,), np.inf, jnp.float32)

orgj, dirj = jnp.asarray(org), jnp.asarray(dirn)

t_p, i_p = pb8.intersect_triangles_bvh8(pack, orgj, dirj, 1e-3, t_max)
t_p, i_p = np.asarray(t_p), np.asarray(i_p)

# jnp oracle (the threaded walk)
os.environ["RRT_NO_PALLAS"] = "1"
fn = jax.jit(lambda o, d, tm: isect.intersect_triangles(pack, o, d, 1e-3, tm))
t_o, i_o = fn(orgj, dirj, t_max)
t_o, i_o = np.asarray(t_o), np.asarray(i_o)
del os.environ["RRT_NO_PALLAS"]

hit_o = i_o >= 0
hit_p = i_p >= 0
agree = hit_o == hit_p
print(f"hit-agree {agree.mean()*100:.3f}%  hits {hit_o.mean()*100:.1f}%")
both = hit_o & hit_p
terr = np.abs(t_p[both] - t_o[both]) / np.maximum(np.abs(t_o[both]), 1e-6)
print(f"t relerr max {terr.max() if both.any() else 0:.2e}  idx-agree "
      f"{(i_p[both] == i_o[both]).mean()*100:.2f}%")
bad = np.where(~agree)[0][:5]
for b in bad:
    print("  disagree lane", b, "oracle", t_o[b], i_o[b], "pallas", t_p[b], i_p[b])
