"""End-to-end smoke tests: render the `test` scene tiny and check basic
radiometric structure (sky brightness, floor/ball reflectance bounds)."""
import numpy as np
import pytest

from rust_raytracer_tpu import models
from rust_raytracer_tpu.render.camera import Camera
from rust_raytracer_tpu.render.renderer import Renderer


@pytest.fixture(scope="module")
def test_film():
    scene = models.build("test")
    cam = Camera(
        image_width=64, aspect_ratio=1.5, samples_per_pixel=16, max_depth=6,
        position=(0, 0, 1), look_at=(0, 0, 0), focal_length=50.0,
    )
    r = Renderer(scene, cam, batch_size=64 * 42 * 4)
    return r.render()


def test_image_finite_and_positive(test_film):
    img = test_film.hdr()
    assert img.shape == (42, 64, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()


def test_sky_region_is_sky_color(test_film):
    img = test_film.hdr()
    # top rows see the constant (2,2,2) sky directly
    np.testing.assert_allclose(img[0, :, :], 2.0, atol=1e-3)


def test_ball_region_reddish(test_film):
    img = test_film.hdr()
    h, w, _ = img.shape
    c = img[h // 2, w // 2]
    # glossy ball albedo (0.8, 0, 0.2) under white sky: red > green
    assert c[0] > c[1]


def test_tonemapped_output_valid(test_film):
    out = test_film.to_image("aces")
    assert out.dtype == np.uint8
    out2 = test_film.to_image("clamp")
    assert out2.shape == out.shape


def test_ppm_p3_writer(test_film, tmp_path):
    """ASCII P3 parity with the reference's legacy writer (ppm.rs:9-38):
    header, row-major 'r g b' lines, gamma 1/2.2 mapping of the RAW
    buffer (not the ACES/sRGB chain)."""
    import os

    path = os.path.join(tmp_path, "out.ppm")
    test_film.save_ppm_p3(path)
    lines = open(path).read().splitlines()
    assert lines[0] == "P3"
    w, h = map(int, lines[1].split())
    assert (w, h) == (test_film.width, test_film.height)
    assert lines[2] == "255"
    body = lines[3:]
    assert len(body) == w * h
    # spot-check the first pixel against the reference formula
    hdr = test_film.hdr()
    r, g, b = (min(max(float(x), 0.0) ** (1 / 2.2), 1.0) * 255.999
               for x in hdr[0, 0])
    assert body[0] == f"{int(r)} {int(g)} {int(b)}"
