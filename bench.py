#!/usr/bin/env python
"""Benchmark harness — run by the driver on real TPU hardware.

Measures forward path-tracing throughput on the cornell_dragon benchmark
(1200x1200, ~870k tris; a procedural stand-in replaces the stripped dragon
OBJ) through the production render path — the persistent ray-pool
renderer (render/pool.py) — and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "pixel-samples/s", "vs_baseline": N}

Baseline: the reference renders cornell_dragon 1200x1200@1000spp in ~41 min
on an M3 Pro with 10 threads ~= 0.59 M pixel-samples/s (BASELINE.md).

Knobs (env): RRT_BENCH_SCENE, RRT_BENCH_WIDTH, RRT_BENCH_SPP,
RRT_BENCH_LANES, RRT_BENCH_DEPTH.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PIXEL_SAMPLES_PER_S = 0.59e6  # BASELINE.md cornell_dragon


def main():
    import jax
    import jax.numpy as jnp

    from rust_raytracer_tpu import models
    from rust_raytracer_tpu.render import pool as poolmod
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg

    scene_name = os.environ.get("RRT_BENCH_SCENE", "cornell_dragon")
    width = int(os.environ.get("RRT_BENCH_WIDTH", "1200"))
    spp = int(os.environ.get("RRT_BENCH_SPP", "2"))
    n_lanes = int(os.environ.get("RRT_BENCH_LANES", str(1 << 18)))
    max_depth = int(os.environ.get("RRT_BENCH_DEPTH", "20"))

    t0 = time.time()
    scene = models.build(scene_name)
    scene_config = cfg.merge_scene_config(scene.config, {"output_width": width})
    render_cfg = cfg.RenderConfig(samples_per_pixel=spp, max_depth=max_depth)
    camera = cfg.make_camera(scene_config, render_cfg)
    r = Renderer(scene, camera, batch_size=n_lanes)
    build_s = time.time() - t0

    w, h = camera.image_width, camera.image_height
    n_pixels = w * h
    total = n_pixels * spp

    # warmup / compile: one pool step on a throwaway state
    state = poolmod.init_state(n_lanes, n_pixels)
    step = poolmod.make_step(r.pack, r.static, camera, total, spp, 0)
    t0 = time.time()
    state = step(r.pack, state)
    jax.block_until_ready(state.accum)
    compile_s = time.time() - t0
    del state

    # timed: full pool render of the (pixel, sample) grid
    t0 = time.time()
    state = poolmod.init_state(n_lanes, n_pixels)
    max_steps = total * max_depth // n_lanes + 2 * max_depth
    done = 0
    while done < max_steps:
        for _ in range(10):
            state = step(r.pack, state)
        done += 10
        issued = int(jnp.sum(state.next_flat))
        if issued >= total and not bool(jnp.any(state.active)):
            break
    jax.block_until_ready(state.accum)
    elapsed = time.time() - t0

    value = total / elapsed
    result = {
        "metric": (
            f"pixel-samples/s fwd {scene_name} {w}x{h}@{spp}spp depth={max_depth} "
            f"pool renderer (1 chip; scene build {build_s:.1f}s, "
            f"compile {compile_s:.1f}s)"
        ),
        "value": round(value, 1),
        "unit": "pixel-samples/s",
        "vs_baseline": round(value / BASELINE_PIXEL_SAMPLES_PER_S, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
