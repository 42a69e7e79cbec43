# Submodules imported directly (rust_raytracer_tpu.parallel.mesh, ...).
