"""Wavefront path-tracing integrator.

The reference's recursive `Camera::ray_color` (camera.rs:282-332) becomes an
iterative loop over bounce depth on an SoA ray state — the standard
wavefront transform for throughput-oriented hardware.  The per-vertex
estimator is identical (one-sample NEE mixture):

  radiance += throughput * emission(vertex)
  throughput *= attenuation * scattering_pdf / mix_pdf     (diffuse family)
  throughput *= attenuation                                 (specular family)

Control flow is `lax.fori_loop` over a static max_depth with masked lanes —
differentiable (reverse-mode unrolls the bounded loop) and XLA-friendly.

Between bounces the wavefront is COMPACTED AND SORTED: lanes are reordered
by (dead-last, direction octant, position Morton code).  Dead lanes pack
into trailing ray packets whose traversal terminates at the BVH root
(ops/pallas_intersect.py tests packet-wide any-hit), and live lanes regain
the spatial coherence the Pallas packet traversal feeds on.  Because the
RNG streams are keyed by the (pixel, sample) ids that travel with each
lane (core/rng.py), reordering never changes a single sample — images are
bit-identical with compaction on or off, and across any sharding.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng as vrng
from ..ops import intersect as isect
from ..ops import shade as shd
from ..ops import texture as tex
from ..scene import pack as sp
from ..scene.compiler import SceneStatic

# Minimum hit distance (reference: camera.rs:294 Interval(0.001, INF)).
T_MIN = 1e-3


def _expand_bits8(v):
    """Spread the low 8 bits of v to every 3rd bit (Morton interleave)."""
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def _compaction_key(org, dirn, alive):
    """Sort key: dead lanes last; live lanes grouped by direction octant,
    then by a 24-bit Morton code of the origin (normalized to this
    wavefront's bounding box)."""
    u32 = jnp.uint32
    dead = jnp.where(alive, u32(0), u32(1))
    octant = (
        (dirn[:, 0] < 0).astype(u32) * u32(4)
        + (dirn[:, 1] < 0).astype(u32) * u32(2)
        + (dirn[:, 2] < 0).astype(u32)
    )
    lo = jnp.min(org, axis=0)
    span = jnp.maximum(jnp.max(org, axis=0) - lo, 1e-20)
    q = jnp.clip((org - lo) / span * 255.0, 0.0, 255.0).astype(u32)
    morton = (
        (_expand_bits8(q[:, 0]) << u32(2))
        | (_expand_bits8(q[:, 1]) << u32(1))
        | _expand_bits8(q[:, 2])
    )
    # morton occupies bits 0..23; octant 28..30; dead 31
    return (dead << u32(31)) | (octant << u32(28)) | morton


def trace(
    pack: sp.ScenePack,
    static: SceneStatic,
    org,
    dirn,
    rng_ctx: vrng.Ctx,
    max_depth: int,
    light_bias: float,
    compact: bool = True,
):
    """Trace a batch of rays to completion; returns (N, 3) radiance in the
    caller's lane order."""
    n = org.shape[0]
    dtype = org.dtype

    pixel0 = jnp.asarray(rng_ctx.pixel, jnp.uint32)
    sample0 = jnp.asarray(rng_ctx.sample, jnp.uint32)
    seed = rng_ctx.seed

    def bounce_body(depth, state):
        org, dirn, throughput, radiance, alive, pixel, sample, src = state

        if compact:
            perm = jnp.argsort(_compaction_key(org, dirn, alive))
            org, dirn = org[perm], dirn[perm]
            throughput, radiance = throughput[perm], radiance[perm]
            alive, src = alive[perm], src[perm]
            pixel, sample = pixel[perm], sample[perm]

        ctx = vrng.Ctx(pixel=pixel, sample=sample, bounce=depth, seed=seed)

        hit = isect.intersect(pack, org, dirn, T_MIN, ctx, alive=alive)
        # detach traversal decisions (ids + raw t); hit_attributes recomputes
        # t differentiably, keeping the BVH while_loop out of the AD graph
        hit = jax.tree_util.tree_map(lax.stop_gradient, hit)
        attr = isect.hit_attributes(pack, org, dirn, hit)

        # texture program over this wavefront's shading points
        tex_values = tex.eval_program(
            static.tex_program, pack.tex_data, attr.uv, attr.pos
        )

        res = shd.shade(
            pack, static.light_list, tex_values, org, dirn, hit, attr,
            ctx, light_bias,
        )

        # miss -> background (camera.rs:331), then terminate
        miss = ~attr.valid
        emission = jnp.where(miss[:, None], pack.background[None, :], res.emission)

        radiance = radiance + throughput * emission * alive[:, None]
        throughput = throughput * jnp.where(alive[:, None], res.weight, 0.0)
        alive = alive & ~res.terminate & ~miss
        # keep dead lanes numerically inert
        new_org = jnp.where(alive[:, None], attr.pos, org)
        new_dir = jnp.where(alive[:, None], res.new_dir, dirn)
        return (new_org, new_dir, throughput, radiance, alive, pixel,
                sample, src)

    state = (
        org,
        dirn,
        jnp.ones((n, 3), dtype),
        jnp.zeros((n, 3), dtype),
        jnp.ones((n,), bool),
        pixel0,
        sample0,
        jnp.arange(n, dtype=jnp.int32),
    )
    # depth-0 black cutoff (camera.rs:290-292) is implicit: the loop simply
    # stops contributing after max_depth scatters.
    state = lax.fori_loop(0, max_depth, bounce_body, state, unroll=False)
    radiance, src = state[3], state[7]
    if compact:
        # scatter back to the caller's lane order
        radiance = jnp.zeros((n, 3), dtype).at[src].set(radiance)
    return radiance
