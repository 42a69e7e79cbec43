"""Golden-image parity against the reference renderer's own output.

The reference ships its renders (samples/sample{0,1,2}.png, README.md:9-15).
`light_test` is the one deterministic sampled scene (golden_monkey places
spheres with an unseeded RNG, cornell_dragon's mesh asset is stripped), so
this renders it at low resolution / moderate spp, box-downsamples the
2400x1600 converged reference render to match, and compares tonemapped
sRGB u8 images after a 3x3 blur that suppresses residual MC noise.

Calibrated error at 80px/25spp (2026-08, CPU jnp path): blurred mean 5.9,
p95 29.8 out of 255.  Thresholds carry ~50% margin — the test fails on
estimator drift (broken NEE weights, tonemap changes, flipped normals,
camera/DoF regressions), not on noise.
"""
import os

import numpy as np
import pytest

SAMPLE1 = "/root/reference/samples/sample1.png"


def _blur3(img):
    out = np.zeros_like(img)
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    for dy in range(3):
        for dx in range(3):
            out += pad[dy:dy + img.shape[0], dx:dx + img.shape[1]] / 9.0
    return out


@pytest.mark.skipif(not os.path.exists(SAMPLE1),
                    reason="reference sample renders not mounted")
def test_light_test_matches_reference_render():
    from PIL import Image

    from rust_raytracer_tpu import models
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg

    scene = models.build("light_test")
    sc_cfg = cfg.merge_scene_config(scene.config, {"output_width": 80})
    cam = cfg.make_camera(
        sc_cfg, cfg.RenderConfig(samples_per_pixel=25, max_depth=20)
    )
    film = Renderer(scene, cam, batch_size=1 << 16, kernel="jnp").render(
        mode="batch"
    )
    ours = film.to_image("aces").astype(np.float64)

    ref = Image.open(SAMPLE1).convert("RGB")
    ref = ref.resize((cam.image_width, cam.image_height), Image.BOX)
    ref = np.asarray(ref, np.float64)

    d = np.abs(_blur3(ours) - _blur3(ref))
    assert d.mean() < 9.0, f"mean sRGB error {d.mean():.2f} exceeds budget"
    assert np.percentile(d, 95) < 45.0, (
        f"p95 sRGB error {np.percentile(d, 95):.2f} exceeds budget"
    )


SAMPLE0 = "/root/reference/samples/sample0.png"
_HERE = os.path.dirname(__file__)


@pytest.mark.skipif(not os.path.exists(SAMPLE0),
                    reason="reference sample renders not mounted")
def test_golden_monkey_matches_reference_render():
    """sample0.png (golden_monkey 1200x800@4000spp, README.md:9-11) vs our
    builtin at 72px.  The reference places its 21x21 sphere field with an
    UNSEEDED thread_rng (golden_monkey.rs:83-118) while ours is seeded, so
    individual spheres cannot match — the comparison is blurred and coarse,
    locking the parts that are deterministic: Suzanne, floor checker, sky
    gradient, sun glow, overall exposure through the ACES chain.

    Calibrated error at 72px/25spp (2026-08, CPU jnp path): full-res
    blurred mean 28.5 / p95 105 — dominated by per-sphere color/position
    mismatch, which no threshold on a 72px grid can separate from real
    regressions.  The assertion therefore compares 12x8 box averages
    (each cell ~18 spheres: the shuffle averages out, composition and
    exposure do not): calibrated mean 20.7 / p95 72; thresholds carry
    ~50% margin and still fail on black frames, exposure or camera
    regressions, or a broken tonemap chain."""
    from PIL import Image

    from rust_raytracer_tpu import models
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg

    scene = models.build("golden_monkey")
    sc_cfg = cfg.merge_scene_config(scene.config, {"output_width": 72})
    cam = cfg.make_camera(
        sc_cfg, cfg.RenderConfig(samples_per_pixel=25, max_depth=20)
    )
    film = Renderer(scene, cam, batch_size=1 << 16, kernel="jnp").render(
        mode="batch"
    )
    ours = film.to_image("aces").astype(np.float64)

    ref = Image.open(SAMPLE0).convert("RGB")
    ref = ref.resize((cam.image_width, cam.image_height), Image.BOX)
    ref = np.asarray(ref, np.float64)

    def coarse(img):
        im = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
        return np.asarray(im.resize((12, 8), Image.BOX), np.float64)

    d = np.abs(coarse(ours) - coarse(ref))
    assert d.mean() < 30.0, f"mean sRGB error {d.mean():.2f} exceeds budget"
    assert np.percentile(d, 95) < 110.0, (
        f"p95 sRGB error {np.percentile(d, 95):.2f} exceeds budget"
    )


def test_cornell_matches_stored_golden():
    """Estimator lock: cornell at 64px/49spp vs a converged self-render
    committed at tests/golden/cornell_64.npy (jnp kernel, seed 0).  The
    counter-based RNG makes the render deterministic, so the tolerance is
    tight — any change to NEE weights, material sampling, RNG streams or
    tonemapping moves this image."""
    from rust_raytracer_tpu import models
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg

    golden_path = os.path.join(_HERE, "golden", "cornell_64.npy")
    scene = models.build("cornell")
    sc_cfg = cfg.merge_scene_config(scene.config, {"output_width": 64})
    cam = cfg.make_camera(
        sc_cfg, cfg.RenderConfig(samples_per_pixel=49, max_depth=20)
    )
    film = Renderer(scene, cam, batch_size=1 << 16, kernel="jnp").render(
        mode="batch"
    )
    ours = np.asarray(film.hdr(), np.float32)

    if not os.path.exists(golden_path):  # regeneration path (documented)
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.save(golden_path, ours)
        pytest.skip("golden regenerated — rerun to compare")

    ref = np.load(golden_path)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
