import os, time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8

scene = models.build("cornell_dragon")
pack, _ = sc.compile_scene(scene)

rng = np.random.default_rng(0)
def run(N, label, coherent):
    t_max = jnp.full((N,), np.inf, jnp.float32)
    if coherent:
        org = np.tile(np.array([278,278,-800], np.float32), (N,1))
        px = rng.uniform(0,555,(N,)); py = rng.uniform(0,555,(N,))
        dirn = np.stack([px-278, py-278, np.full((N,),800.0)],-1).astype(np.float32)
        k = np.lexsort((py//4, px//4)); org, dirn = org[k], dirn[k]
    else:
        org = rng.uniform(0,555,(N,3)).astype(np.float32)
        dirn = rng.normal(size=(N,3)).astype(np.float32)
        from rust_raytracer_tpu.render.integrator import _compaction_key
        key = np.asarray(_compaction_key(jnp.asarray(org), jnp.asarray(dirn), jnp.ones((N,), bool)))
        k = np.argsort(key); org, dirn = org[k], dirn[k]
    orgj, dirj = jnp.asarray(org), jnp.asarray(dirn)
    out = pb8.intersect_triangles_bvh8(pack, orgj, dirj, 1e-3, t_max)
    _ = np.asarray(out[0])
    t0 = time.time(); reps=3
    for _ in range(reps):
        out = pb8.intersect_triangles_bvh8(pack, orgj, dirj, 1e-3, t_max)
        r = np.asarray(out[0])
    dt = (time.time()-t0)/reps
    print(f"{label} N={N}: {dt*1e3:.0f} ms -> {N/dt/1e6:.2f} M rays/s")

run(1<<15, "coh", True)
run(1<<17, "coh", True)
run(1<<20, "coh", True)
run(1<<17, "incoh-sorted", False)
run(1<<20, "incoh-sorted", False)
