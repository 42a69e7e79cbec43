from . import camera, film, integrator, renderer  # noqa: F401
