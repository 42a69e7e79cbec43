# Submodules are imported directly (rust_raytracer_tpu.scene.compiler, ...);
# kept lazy here to avoid ops <-> scene import cycles.
