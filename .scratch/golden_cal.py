import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import time
import numpy as np
from PIL import Image
from rust_raytracer_tpu import models
from rust_raytracer_tpu.render.renderer import Renderer
from rust_raytracer_tpu.utils import config as cfg

W, SPP = 80, 25
scene = models.build("light_test")
sc_cfg = cfg.merge_scene_config(scene.config, {"output_width": W})
cam = cfg.make_camera(sc_cfg, cfg.RenderConfig(samples_per_pixel=SPP, max_depth=20))
t0 = time.time()
r = Renderer(scene, cam, batch_size=1 << 16, kernel="jnp")
film = r.render(mode="batch")
print("render", time.time() - t0, "s", flush=True)
ours = film.to_image("aces").astype(np.float64)

ref = Image.open("/root/reference/samples/sample1.png").convert("RGB")
ref = ref.resize((cam.image_width, cam.image_height), Image.BOX)
ref = np.asarray(ref, np.float64)

def blur3(img):
    k = np.ones((3, 3)) / 9.0
    out = np.zeros_like(img)
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    for dy in range(3):
        for dx in range(3):
            out += pad[dy:dy + img.shape[0], dx:dx + img.shape[1]] * k[dy, dx]
    return out

d_raw = np.abs(ours - ref)
print("raw  mean", d_raw.mean(), "p95", np.percentile(d_raw, 95))
ours = blur3(ours); ref = blur3(ref)
d = np.abs(ours - ref)
print("mean", d.mean(), "p95", np.percentile(d, 95), "p99", np.percentile(d, 99), "max", d.max())
Image.fromarray(ours.astype(np.uint8)).save("/tmp/golden_ours.png")
Image.fromarray(ref.astype(np.uint8)).save("/tmp/golden_ref.png")
