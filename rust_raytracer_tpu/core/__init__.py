from . import math, rng  # noqa: F401
