"""Camera model + ray generation (reference: src/camera.rs).

Host-side `Camera` precomputes the view geometry exactly as the reference's
`Camera::init` (camera.rs:86-130): 35mm-equivalent FOV (h = 24/focal_length),
look-at basis, image plane at the focus distance, aperture radius =
(f/1000)/f_number.  `generate_rays` is the device-side batched version of
`get_ray` (camera.rs:260-280): stratified jittered pixel samples + optional
defocus origin.

Parity quirks preserved:
  * the basis vectors u = v_up x w, v = w x u are NOT normalized
    (camera.rs:100-104) — off-horizontal cameras get a slightly scaled
    viewport;
  * `random_in_unit_disk` actually samples the unit-circle rim
    (vec4.rs:35-40), giving ring bokeh;
  * spp quantizes to threads * floor(sqrt(spp/threads))^2 (config.rs:154-155).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath
from ..core import rng as vrng


@dataclasses.dataclass
class Camera:
    image_width: int = 600
    aspect_ratio: float = 1.5
    focal_length: float = 50.0
    f_number: Optional[float] = None
    focus_distance: Optional[float] = None
    position: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    look_at: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    v_up: Tuple[float, float, float] = (0.0, 1.0, 0.0)

    # render params (reference CameraConfig, config.rs:46-52)
    samples_per_pixel: int = 250
    max_depth: int = 20
    light_bias: float = 0.25
    thread_count: int = 1  # kept for spp-quantization parity only

    def __post_init__(self):
        self._init()

    def _init(self):
        self.image_height = max(1, int(self.image_width / self.aspect_ratio))

        pos = np.asarray(self.position, np.float64)
        target = np.asarray(self.look_at, np.float64)
        vup = np.asarray(self.v_up, np.float64)

        direction = pos - target
        focus_dist = (
            self.focus_distance
            if self.focus_distance is not None
            else float(np.linalg.norm(direction))
        )
        h = 24.0 / self.focal_length
        real_aspect = self.image_width / self.image_height
        viewport_h = focus_dist * h
        viewport_w = viewport_h * real_aspect

        w = direction / np.linalg.norm(direction)
        u = np.cross(vup, w)   # NOT normalized — parity with camera.rs:102
        v = np.cross(w, u)
        self.basis = (u, v, w)

        viewport_u = u * viewport_w
        viewport_v = -v * viewport_h
        self.pixel_delta_u = viewport_u / self.image_width
        self.pixel_delta_v = viewport_v / self.image_height
        upper_left = pos - w * focus_dist - viewport_u / 2.0 - viewport_v / 2.0
        self.first_pixel = upper_left + (self.pixel_delta_u + self.pixel_delta_v) * 0.5

        self.aperture_radius = (
            (self.focal_length / 1000.0) / self.f_number
            if self.f_number is not None
            else None
        )

        # spp quantization (config.rs:154-155)
        spt = max(1, self.samples_per_pixel // self.thread_count)
        self.sqrt_spt = max(1, int(math.sqrt(spt)))
        self.actual_spp = self.thread_count * self.sqrt_spt * self.sqrt_spt

    def generate_rays(self, px, py, sample_id, rng_ctx, dtype=jnp.float32):
        """Batched `get_ray`: (N,) pixel coords + sample ids -> (org, dir).

        Stratification: within each virtual thread, sample j maps to the
        (sx, sy) cell of a sqrt_spt x sqrt_spt grid (camera.rs:334-341).
        """
        spt = self.sqrt_spt * self.sqrt_spt
        j = sample_id % spt
        sx = (j % self.sqrt_spt).astype(dtype)
        sy = (j // self.sqrt_spt).astype(dtype)
        inv_sqrt_spt = 1.0 / self.sqrt_spt

        jx, jy, _, _ = rng_ctx.uniform4(vrng.Streams.PIXEL_JITTER)
        ox = (sx + jx) * inv_sqrt_spt - 0.5
        oy = (sy + jy) * inv_sqrt_spt - 0.5

        du = jnp.asarray(self.pixel_delta_u, dtype)
        dv = jnp.asarray(self.pixel_delta_v, dtype)
        first = jnp.asarray(self.first_pixel, dtype)
        pos = jnp.asarray(np.asarray(self.position, np.float64), dtype)

        pixel_sample = (
            first
            + du * (px.astype(dtype) + ox)[:, None]
            + dv * (py.astype(dtype) + oy)[:, None]
        )

        if self.aperture_radius is not None:
            c1, c2, _, _ = rng_ctx.uniform4(vrng.Streams.APERTURE)
            rim = vmath.square_to_unit_circle(c1, c2)
            bu = jnp.asarray(self.basis[0], dtype)
            bv = jnp.asarray(self.basis[1], dtype)
            org = pos + (
                bu * rim[:, 0:1] + bv * rim[:, 1:2]
            ) * self.aperture_radius
        else:
            org = jnp.broadcast_to(pos, pixel_sample.shape)

        return org, pixel_sample - org
