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
Terminated lanes carry zero weight; there is no compaction yet (every lane
costs a full bounce), which is the first target for the Pallas rewrite.
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


def trace(
    pack: sp.ScenePack,
    static: SceneStatic,
    org,
    dirn,
    rng_ctx: vrng.Ctx,
    max_depth: int,
    light_bias: float,
):
    """Trace a batch of rays to completion; returns (N, 3) radiance."""
    n = org.shape[0]
    dtype = org.dtype

    def bounce_body(depth, state):
        org, dirn, throughput, radiance, alive = state
        ctx = rng_ctx.at_bounce(depth)

        hit = isect.intersect(pack, org, dirn, T_MIN, ctx)
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
        return new_org, new_dir, throughput, radiance, alive

    state = (
        org,
        dirn,
        jnp.ones((n, 3), dtype),
        jnp.zeros((n, 3), dtype),
        jnp.ones((n,), bool),
    )
    # depth-0 black cutoff (camera.rs:290-292) is implicit: the loop simply
    # stops contributing after max_depth scatters.
    state = lax.fori_loop(0, max_depth, bounce_body, state, unroll=False)
    return state[3]
