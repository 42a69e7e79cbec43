from . import aabb, math, rng  # noqa: F401
