"""rust_raytracer_tpu — a TPU-native differentiable path tracing framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
reference CPU ray tracer (teofum/rust_raytracer): stratified sampling, BVH-
accelerated meshes, lambertian/metal/dielectric/glossy/emissive/isotropic
materials, NEE light-biased scatter PDFs, procedural + image textures with
normal maps, constant-density volumes, ACES tonemapping, a scene DSL, and
multi-chip rendering via jax.sharding.

Layer map (TPU-first, not a port):
  core/      batched vector math, counter-based RNG, AABB slabs
  ops/       device kernels: intersection, BVH traversal, shading, textures,
             light PDFs, tonemapping
  scene/     host-side scene graph + compiler -> flat SoA device arrays,
             OBJ loader, scene DSL, BVH builder
  render/    camera, wavefront integrator, film/output
  parallel/  device mesh + shard_map sample/tile sharding
  models/    built-in scene registry (golden_monkey, cornell, ...)
  utils/     config merge + CLI, logging, profiling, checkpointing
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: integrator graphs are large and this
# host has few cores, so cross-process cache hits matter.  Override the
# location with JAX_COMPILATION_CACHE_DIR; set it empty to disable.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/rrt_xla")
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
