"""Step the real cornell_dragon camera wavefront bounce by bounce; at each
depth, dump (org, dir, alive) and measure BVH8 traversal time under
different compaction keys."""
import time
import numpy as np
import jax, jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.ops import shade as shd
from rust_raytracer_tpu.ops import texture as tex
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.render import integrator as integ
from rust_raytracer_tpu.core import rng as vrng
from rust_raytracer_tpu.utils import config as cfg

scene = models.build("cornell_dragon")
scene_config = cfg.merge_scene_config(scene.config, {"output_width": 1200})
render_cfg = cfg.RenderConfig(samples_per_pixel=4, max_depth=20)
camera = cfg.make_camera(scene_config, render_cfg)
pack, static = sc.compile_scene(scene)

B = 1 << 18
w = camera.image_width
px = jnp.asarray(np.arange(B) % w, jnp.uint32)
py = jnp.asarray((np.arange(B) // w) % camera.image_height, jnp.uint32)
seed = jnp.uint32(0)

@jax.jit
def gen(px, py):
    ctx = vrng.Ctx(pixel=py * np.uint32(w) + px, sample=jnp.zeros((B,), jnp.uint32),
                   bounce=jnp.uint32(0), seed=seed)
    return camera.generate_rays(px, py, jnp.zeros((B,), jnp.uint32), ctx, jnp.float32)

@jax.jit
def one_bounce(org, dirn, alive, depth):
    ctx = vrng.Ctx(pixel=py * np.uint32(w) + px, sample=jnp.zeros((B,), jnp.uint32),
                   bounce=depth, seed=seed)
    hit = isect.intersect(pack, org, dirn, 1e-3, ctx, alive=alive)
    hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
    attr = isect.hit_attributes(pack, org, dirn, hit)
    tv = tex.eval_program(static.tex_program, pack.tex_data, attr.uv, attr.pos)
    res = shd.shade(pack, static.light_list, tv, org, dirn, hit, attr, ctx, 0.25)
    miss = ~attr.valid
    alive2 = alive & ~res.terminate & ~miss
    new_org = jnp.where(alive2[:, None], attr.pos, org)
    new_dir = jnp.where(alive2[:, None], res.new_dir, dirn)
    return new_org, new_dir, alive2

org, dirn = gen(px, py)
alive = jnp.ones((B,), bool)
states = []
for depth in range(8):
    states.append((np.asarray(org), np.asarray(dirn), np.asarray(alive)))
    org, dirn, alive = one_bounce(org, dirn, alive, jnp.uint32(depth))
    print(f"depth {depth}: alive after = {float(jnp.mean(alive))*100:.1f}%")
np.savez("/root/repo/.scratch/wavefronts.npz",
         **{f"o{d}": s[0] for d, s in enumerate(states)},
         **{f"d{d}": s[1] for d, s in enumerate(states)},
         **{f"a{d}": s[2] for d, s in enumerate(states)})
print("saved")
