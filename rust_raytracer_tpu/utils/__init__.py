# Submodules imported directly (rust_raytracer_tpu.utils.assets, ...).
