"""Axis-aligned bounding box helpers (reference: src/aabb.rs).

Boxes are (min, max) pairs of (..., 3) arrays.  The slab test is the
branchless Williams et al. formulation — on TPU we always evaluate both
slabs and combine with min/max, which vectorizes perfectly.
"""
from __future__ import annotations

import jax.numpy as jnp

# Padding added around every box so axis-aligned geometry still has volume
# (reference: aabb.rs:9, BOUNDS_PADDING = 0.001).
BOUNDS_PADDING = 1e-3


def combine(min_a, max_a, min_b, max_b):
    """Union of two boxes (reference: aabb.rs:11-27)."""
    return jnp.minimum(min_a, min_b), jnp.maximum(max_a, max_b)


def from_points(points, pad: float = BOUNDS_PADDING):
    """Bounding box of a point cloud, padded (reference: aabb.rs:29-45)."""
    lo = jnp.min(points, axis=-2) - pad
    hi = jnp.max(points, axis=-2) + pad
    return lo, hi


def hit_slab(box_min, box_max, origin, inv_dir, t_min, t_max):
    """Branchless slab test.

    Returns (hit, t_near): `hit` bool, `t_near` the entry t (clamped to
    t_min when the origin is inside).  `inv_dir` may contain +/-inf for
    axis-parallel rays; IEEE inf semantics give the correct result as long
    as origins are finite (reference: aabb.rs:47-87).
    """
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    # When inv_dir has an inf and origin sits exactly on the slab, 0*inf=nan;
    # push nans out of the running min/max.
    near = jnp.where(jnp.isnan(t0), -jnp.inf, jnp.minimum(t0, t1))
    far = jnp.where(jnp.isnan(t1), jnp.inf, jnp.maximum(t0, t1))
    t_near = jnp.max(near, axis=-1)
    t_far = jnp.min(far, axis=-1)
    hit = (t_near <= t_far) & (t_far > t_min) & (t_near < t_max)
    return hit, jnp.maximum(t_near, t_min)
