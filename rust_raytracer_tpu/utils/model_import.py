"""`model:` asset import (reference: src/loaders/assimp.rs).

The reference binds Assimp (russimp) to import arbitrary model formats with
cameras, transforms and PBR materials.  Assimp is not available in this
environment, so this module implements the same *pipeline* for the formats
we can parse natively:

  * .obj — meshes via the OBJ parser (materials default to Glossy like
    assimp.rs:156-170's fallback; no cameras in OBJ)
  * .gltf / .glb — gated: raises with a clear message until a parser lands

Matching assimp.rs semantics where applicable:
  * node transforms bake into meshes (assimp.rs:71-91)
  * emissive materials get an invisible proxy sphere added to the lights
    list for importance sampling (assimp.rs:123-129) — applies to glTF
    emissive materials once supported.
"""
from __future__ import annotations

import os

from ..scene import graph as g
from . import assets


def load_model(path: str) -> g.SceneDef:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        mat = g.Glossy(
            g.Constant((0.8, 0.8, 0.8)), g.Constant(0.5), 1.5
        )  # assimp.rs default-ish PBR fallback
        mesh = assets.load_obj(path, mat)
        sky = g.Sky(g.Constant((1.0, 1.0, 1.0)))
        world = g.Group([mesh, sky])
        return g.SceneDef(world=world, lights=[sky], config={})
    raise NotImplementedError(
        f"model import for '{ext}' requires an Assimp-equivalent backend; "
        "supported today: .obj (glTF planned)"
    )
