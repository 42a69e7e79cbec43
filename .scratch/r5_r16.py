"""R=16 packets: halve per-packet fixed costs (loop tax dominates both
Pallas kernels).  Monkeypatch module constants, run the full wavefront
wrapper, compare time + id parity vs BVH8."""
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

R16 = int(os.environ.get("RRT_R", "16"))
CAP = int(os.environ.get("RRT_CAP", "192"))
K1 = int(os.environ.get("RRT_K1", "48"))
W.R = R16
W.PAIRS_PER_PACKET_CAP = CAP
W.K1 = K1
W._pipeline2.clear_cache()

scene = models.build("cornell_dragon")
pack, static = sc.compile_scene(scene)
d = np.load("/root/repo/.scratch/steady_r5.npz")
org = jnp.asarray(d["org"], jnp.float32)
dirn = jnp.asarray(d["dirn"], jnp.float32)
tmax = jnp.asarray(d["tmax"], jnp.float32)

def bench(f, label, reps=8):
    o = f(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.time()-t0)/reps)
    print(f"RESULT {label:44s} {best*1e3:8.1f} ms", flush=True)

wf = jax.jit(lambda o, d_, tm: W.intersect_triangles_wavefront(pack, o, d_, 1e-3, tm))
bench(lambda: wf(org, dirn, tmax), f"wavefront R={R16} CAP={CAP} K1={K1}")

t_w, i_w = wf(org, dirn, tmax)
b8 = jax.jit(lambda o, d_, tm: pb8.intersect_triangles_bvh8(pack, o, d_, 1e-3, tm))
t_b, i_b = b8(org, dirn, tmax)
i_w, i_b = np.asarray(i_w), np.asarray(i_b)
print("id parity vs BVH8:", (i_w == i_b).mean(), flush=True)
