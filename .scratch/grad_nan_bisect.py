import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.render import integrator
from rust_raytracer_tpu.render.camera import Camera
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.scene import graph as g
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import shade as shd
from rust_raytracer_tpu.ops import texture as tex

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
pix = py * np.uint32(w) + px

# forward (no grad) to depth 2 state
ctx0 = vrng.Ctx(pixel=pix, sample=sample, bounce=jnp.uint32(0), seed=seed)
org, dirn = cam.generate_rays(px, py, sample, ctx0, jnp.float64)
alive = jnp.ones((N,), bool)
for depth in range(2):
    ctx = vrng.Ctx(pixel=pix, sample=sample, bounce=jnp.uint32(depth), seed=seed)
    em, wt, nd, ended, pos = integrator.shade_vertex(pack, static, org, dirn, ctx, 0.25, alive)
    alive = alive & ~ended
    org = jnp.where(alive[:, None], pos, org)
    dirn = jnp.where(alive[:, None], nd, dirn)
org, dirn, alive = map(jax.block_until_ready, (org, dirn, alive))
print("alive at depth 2:", int(alive.sum()))

ctx2 = vrng.Ctx(pixel=pix, sample=sample, bounce=jnp.uint32(2), seed=seed)

def parts(c):
    p = dataclasses.replace(pack, sph_center=c)
    hit = isect.intersect(p, org, dirn, 1e-3, ctx2, alive=alive)
    hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
    attr = isect.hit_attributes(p, org, dirn, hit)
    tv = tex.eval_program(static.tex_program, p.tex_data, attr.uv, attr.pos)
    res = shd.shade(p, static.light_list, tv, org, dirn, hit, attr, ctx2, 0.25)
    return dict(
        t_pos=attr.pos.sum(), t_norm=attr.normal.sum(), t_uv=attr.uv.sum(),
        t_tan=attr.tangent.sum(),
        emission=(res.emission * alive[:, None]).sum(),
        weight=(res.weight * alive[:, None]).sum(),
        new_dir=(res.new_dir * alive[:, None]).sum(),
        em_raw=res.emission.sum(), wt_raw=res.weight.sum(),
    )

keys = list(parts(pack.sph_center).keys())
for k in keys:
    gv = np.asarray(jax.grad(lambda c: parts(c)[k])(pack.sph_center))
    print(f"{k:10s} grad finite: {np.isfinite(gv).all()}", flush=True)
