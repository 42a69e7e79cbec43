"""K1/KC sweep on mid-render-state rays."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_wavefront as W
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8

W.K1 = int(os.environ.get("RRT_K1", "40"))
W.KC = int(os.environ.get("RRT_KC", "32"))
W._pipeline2.clear_cache()

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load("/root/repo/.scratch/steady_mid.npz")
org = jnp.asarray(d["org"], jnp.float32); dirn = jnp.asarray(d["dirn"], jnp.float32)
tmax = jnp.asarray(d["tmax"], jnp.float32)
wf = jax.jit(lambda o, d_, tm: W.intersect_triangles_wavefront(pack, o, d_, 1e-3, tm))
o = wf(org, dirn, tmax); jax.block_until_ready(o[0])
best = 1e9
for _ in range(4):
    t0 = time.time()
    for _ in range(8):
        o = wf(org, dirn, tmax)
    jax.block_until_ready(o[0])
    best = min(best, (time.time()-t0)/8)
t_w, i_w = wf(org, dirn, tmax)
t_b, i_b = jax.jit(lambda o, d_, tm: pb8.intersect_triangles_bvh8(pack, o, d_, 1e-3, tm))(org, dirn, tmax)
par = (np.asarray(i_w) == np.asarray(i_b)).mean()
print(f"RESULT K1={W.K1} KC={W.KC}: {best*1e3:6.1f} ms  parity {par:.5f}", flush=True)
