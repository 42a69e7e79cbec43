# Submodules are imported directly (rust_raytracer_tpu.ops.intersect, ...);
# kept lazy here to avoid ops <-> scene import cycles.
