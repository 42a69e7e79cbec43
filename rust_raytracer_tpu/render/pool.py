"""Persistent ray-pool renderer: wavefront path tracing with dead-lane
regeneration.

The bounded-loop integrator (render/integrator.py) traces a fixed batch of
paths for max_depth bounces; on the cornell benchmark the live fraction
decays 100% -> 70% -> 37% -> 23% -> ... so most of the per-bounce work
(shading, sorting, attribute gathers — dense vector ops that cannot skip
dead lanes) is wasted after a few bounces.

The pool keeps a fixed-size lane array at ~full occupancy instead
(wavefront scheduling with path regeneration, cf. the reference's
thread-pool over samples, camera.rs:189-256 — same estimator, different
schedule): every step advances EVERY lane one bounce; lanes whose path
ends scatter their radiance into the accumulated image and are refilled
with the next un-issued (pixel, sample) id from the global sample grid.
Because the RNG is keyed by (pixel, sample, bounce) (core/rng.py), the
schedule change does not alter a single sample — only the floating-point
order of each pixel's radiance sum differs from the batch renderer.

All shapes are static: one XLA compilation for the whole render.  The
host loop chains K steps per device round-trip and polls a tiny scalar
(lanes remaining) to decide completion.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import rng as vrng
from . import integrator


class PoolState:
    """Pytree of the pool's per-lane state + image accumulator."""

    __slots__ = ("org", "dirn", "throughput", "radiance", "pixel", "sample",
                 "bounce", "active", "accum", "next_flat")

    def __init__(self, org, dirn, throughput, radiance, pixel, sample,
                 bounce, active, accum, next_flat):
        self.org = org
        self.dirn = dirn
        self.throughput = throughput
        self.radiance = radiance
        self.pixel = pixel
        self.sample = sample
        self.bounce = bounce
        self.active = active
        self.accum = accum
        self.next_flat = next_flat


def _flatten(s):
    return (
        (s.org, s.dirn, s.throughput, s.radiance, s.pixel, s.sample,
         s.bounce, s.active, s.accum, s.next_flat),
        None,
    )


jax.tree_util.register_pytree_node(
    PoolState, _flatten, lambda _, l: PoolState(*l)
)


def init_state(n_lanes: int, n_pixels: int, dtype=jnp.float32) -> PoolState:
    return PoolState(
        org=jnp.zeros((n_lanes, 3), dtype),
        dirn=jnp.ones((n_lanes, 3), dtype),
        throughput=jnp.zeros((n_lanes, 3), dtype),
        radiance=jnp.zeros((n_lanes, 3), dtype),
        pixel=jnp.zeros((n_lanes,), jnp.uint32),
        sample=jnp.zeros((n_lanes,), jnp.uint32),
        bounce=jnp.zeros((n_lanes,), jnp.uint32),
        active=jnp.zeros((n_lanes,), bool),
        accum=jnp.zeros((n_pixels, 3), dtype),
        next_flat=jnp.uint32(0),
    )


def make_step(pack, static, camera, total: int, spp: int, seed,
              compact: bool = True, kernel: str = "auto"):
    """Build the jitted pool step.  `total` = n_pixels * spp lane-jobs;
    flat job ids are pixel-major (pixel = flat // spp) so consecutive
    refills share pixels — coherent regeneration."""
    w = np.uint32(camera.image_width)
    max_depth = np.uint32(camera.max_depth)
    light_bias = camera.light_bias
    seed = jnp.uint32(seed)
    total = np.uint32(total)
    spp_u = np.uint32(spp)

    def step(pack, s: PoolState) -> PoolState:
        ctx = vrng.Ctx(pixel=s.pixel, sample=s.sample, bounce=s.bounce,
                       seed=seed)
        emission, weight, new_dir, ended, pos = integrator.shade_vertex(
            pack, static, s.org, s.dirn, ctx, light_bias, s.active,
            kernel=kernel,
        )

        act = s.active[:, None]
        radiance = s.radiance + s.throughput * emission * act
        throughput = s.throughput * jnp.where(act, weight, 0.0)
        bounce = s.bounce + 1
        still = s.active & ~ended & (bounce < max_depth)
        org = jnp.where(still[:, None], pos, s.org)
        dirn = jnp.where(still[:, None], new_dir, s.dirn)

        # retire finished paths into the image accumulator
        retired = s.active & ~still
        accum = s.accum.at[s.pixel].add(
            jnp.where(retired[:, None], radiance, 0.0),
            mode="drop",
        )

        # refill dead lanes with the next un-issued (pixel, sample) jobs
        dead = ~still
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - 1
        new_flat = s.next_flat + rank
        issue = dead & (new_flat < total)
        pix = new_flat // spp_u
        smp = new_flat % spp_u
        px = pix % w
        py = pix // w
        ctx0 = vrng.Ctx(pixel=pix, sample=smp, bounce=jnp.uint32(0),
                        seed=seed)
        g_org, g_dir = camera.generate_rays(px, py, smp, ctx0, s.org.dtype)

        iss = issue[:, None]
        org = jnp.where(iss, g_org, org)
        dirn = jnp.where(iss, g_dir, dirn)
        throughput = jnp.where(iss, 1.0, throughput)
        radiance = jnp.where(iss | retired[:, None], 0.0, radiance)
        pixel = jnp.where(issue, pix, s.pixel)
        sample = jnp.where(issue, smp, s.sample)
        bounce = jnp.where(issue, jnp.uint32(0), bounce)
        active = still | issue
        n_dead = jnp.sum(dead.astype(jnp.uint32))
        next_flat = jnp.minimum(s.next_flat + n_dead, total)

        if compact:
            perm = jnp.argsort(
                integrator._compaction_key(org, dirn, active)
            )
            org, dirn = org[perm], dirn[perm]
            throughput, radiance = throughput[perm], radiance[perm]
            pixel, sample = pixel[perm], sample[perm]
            bounce, active = bounce[perm], active[perm]

        return PoolState(org=org, dirn=dirn, throughput=throughput,
                         radiance=radiance, pixel=pixel, sample=sample,
                         bounce=bounce, active=active, accum=accum,
                         next_flat=next_flat)

    return jax.jit(step, donate_argnums=(1,))


def render_pool(pack, static, camera, n_pixels: int, spp: int,
                n_lanes: int, seed=0, dtype=jnp.float32,
                steps_per_poll: int = 10, progress=None,
                kernel: str = "auto", metrics=None):
    """Render n_pixels * spp samples through a persistent pool of n_lanes.

    Returns the (n_pixels, 3) radiance sum (divide by spp for the mean).
    `progress`, if given, is called with (issued, total) after each poll.
    `metrics`, if given, is a utils.metrics.RenderMetrics that records
    per-poll occupancy and throughput counters.
    """
    total = n_pixels * spp
    state = init_state(n_lanes, n_pixels, dtype)
    step = make_step(pack, static, camera, total, spp, seed, kernel=kernel)

    # Upper bound on steps, for safety against scheduling bugs: every
    # lane-job takes <= max_depth steps.
    max_steps = (total * camera.max_depth) // n_lanes + 2 * camera.max_depth

    done_steps = 0
    while done_steps < max_steps:
        for _ in range(steps_per_poll):
            state = step(pack, state)
        done_steps += steps_per_poll
        issued = int(state.next_flat)
        n_active = int(jnp.sum(state.active.astype(jnp.int32)))
        if metrics is not None:
            for _ in range(steps_per_poll):  # per-poll granularity
                metrics.record_step(n_active, n_lanes, issued)
        if progress is not None:
            progress(issued, total)
        if issued >= total and n_active == 0:
            break
    return state.accum
