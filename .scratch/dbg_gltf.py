import os
os.environ["JAX_PLATFORMS"]="cpu"
import sys; sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from test_gltf import _build_glb
from rust_raytracer_tpu.utils import model_import
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import intersect as isect
from rust_raytracer_tpu.core import rng as vrng

_build_glb("/tmp/fix.glb")
scene = model_import.load_model("/tmp/fix.glb")
pack, static = sc.compile_scene(scene)
print("n tris:", np.asarray(pack.tri_v0).shape, "lights:", static.light_list)
print("v0:", np.asarray(pack.tri_v0)[:4])
print("mat_type:", np.asarray(pack.mat_type))
n = 4
org = jnp.asarray(np.tile([[0,1,4]], (n,1)), jnp.float32)
dirs = np.array([[0,-1,-4],[0,1,-4],[0,-0.24,-1],[0,0.25,-1]], np.float32)
dirn = jnp.asarray(dirs)
ctx = vrng.Ctx(pixel=jnp.arange(n,dtype=jnp.uint32), sample=jnp.zeros(n,jnp.uint32), bounce=jnp.uint32(0), seed=jnp.uint32(0))
hit = isect.intersect(pack, org, dirn, 1e-3, ctx, kernel="jnp")
print("t:", np.asarray(hit.t)); print("kind:", np.asarray(hit.kind)); print("prim:", np.asarray(hit.prim))
attr = isect.hit_attributes(pack, org, dirn, hit)
print("mat:", np.asarray(attr.mat), "front:", np.asarray(attr.front_face))
