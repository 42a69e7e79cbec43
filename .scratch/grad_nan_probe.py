import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.render import integrator
from rust_raytracer_tpu.render.camera import Camera
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.scene import graph as g

light = g.Plane((0, 2.0, 0), (0.8, 0, 0), (0, 0, 0.8),
                g.Emissive(g.Constant((6.0, 6.0, 6.0))))
floor = g.Plane((0, -0.4, 0), (-4, 0, 0), (0, 0, 4),
                g.Lambertian(g.Constant((0.6, 0.6, 0.6))))
ball = g.Sphere((0, 0, 0), 0.35, g.Lambertian(g.Constant((0.7, 0.2, 0.2))))
sky = g.Sky(g.Constant((0.1, 0.1, 0.1)))
scene = g.SceneDef(world=g.Group([ball, floor, light, sky]),
                   lights=[light, sky], config={})
pack, static = sc.compile_scene(scene, dtype=jnp.float64)

cam = Camera(image_width=16, aspect_ratio=1.0, samples_per_pixel=1,
             max_depth=3, position=(0, 0.3, 1.6), look_at=(0, 0, 0),
             focal_length=35.0)
w = cam.image_width
N = 256
px = jnp.asarray(np.arange(N) % w, jnp.uint32)
py = jnp.asarray((np.arange(N) // w) % cam.image_height, jnp.uint32)
sample = jnp.zeros((N,), jnp.uint32)
seed = jnp.uint32(7)

def rad_lane(pack, depth):
    ctx = vrng.Ctx(pixel=py * np.uint32(w) + px, sample=sample,
                   bounce=jnp.uint32(0), seed=seed)
    org, dirn = cam.generate_rays(px, py, sample, ctx, jnp.float64)
    return integrator.trace(pack, static, org, dirn, ctx, depth, 0.25,
                            differentiable=True)

# per-lane grad: which lanes give NaN d(sum rad_lane)/d sph_center?
import dataclasses
for depth in (1, 2, 3):
    def f(c, mask):
        p2 = dataclasses.replace(pack, sph_center=c)
        return (rad_lane(p2, depth).sum(axis=1) * mask).sum()
    gfn = jax.jit(jax.grad(f))
    bad = []
    for i in range(N):
        mask = jnp.zeros((N,)).at[i].set(1.0)
        gv = np.asarray(gfn(pack.sph_center, mask))
        if not np.isfinite(gv).all():
            bad.append(i)
    print(f"depth {depth}: {len(bad)} NaN lanes", bad[:10], flush=True)
    if bad:
        break
