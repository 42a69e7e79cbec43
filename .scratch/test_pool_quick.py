"""Pool renderer vs batch renderer: same image (fp-order tolerance)."""
import time
import numpy as np
import jax.numpy as jnp
from rust_raytracer_tpu import models
from rust_raytracer_tpu.render.camera import Camera
from rust_raytracer_tpu.render.renderer import Renderer

scene = models.build("test")
cam = Camera(image_width=96, aspect_ratio=1.5, samples_per_pixel=16,
             max_depth=6, position=(0, 0, 1), look_at=(0, 0, 0),
             focal_length=50.0)
r = Renderer(scene, cam, batch_size=1 << 14)
t0 = time.time(); f_b = r.render_batched(); print(f"batch {time.time()-t0:.1f}s")
t0 = time.time(); f_p = r.render_pool(); print(f"pool  {time.time()-t0:.1f}s")
a = np.asarray(f_b.hdr()); b = np.asarray(f_p.hdr())
print("mean", a.mean(), b.mean())
d = np.abs(a - b)
print("max abs diff", d.max(), "mean abs diff", d.mean())
assert d.max() < 2e-4, "pool and batch disagree"
print("OK")
