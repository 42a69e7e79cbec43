#!/usr/bin/env python
"""Benchmark harness — run by the driver on real TPU hardware.

Measures forward path-tracing throughput on the cornell_dragon benchmark
(1200x1200, ~870k tris; a procedural stand-in replaces the stripped dragon
OBJ) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "pixel-samples/s", "vs_baseline": N}

Baseline: the reference renders cornell_dragon 1200x1200@1000spp in ~41 min
on an M3 Pro with 10 threads ~= 0.59 M pixel-samples/s (BASELINE.md).

Knobs (env): RRT_BENCH_SCENE, RRT_BENCH_WIDTH, RRT_BENCH_BATCHES,
RRT_BENCH_BATCH_SIZE, RRT_BENCH_DEPTH.
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
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg

    scene_name = os.environ.get("RRT_BENCH_SCENE", "cornell_dragon")
    width = int(os.environ.get("RRT_BENCH_WIDTH", "1200"))
    n_batches = int(os.environ.get("RRT_BENCH_BATCHES", "8"))
    batch_size = int(os.environ.get("RRT_BENCH_BATCH_SIZE", str(1 << 18)))
    max_depth = int(os.environ.get("RRT_BENCH_DEPTH", "20"))

    t0 = time.time()
    scene = models.build(scene_name)
    scene_config = cfg.merge_scene_config(scene.config, {"output_width": width})
    render_cfg = cfg.RenderConfig(samples_per_pixel=4, max_depth=max_depth)
    camera = cfg.make_camera(scene_config, render_cfg)
    r = Renderer(scene, camera, batch_size=batch_size)
    build_s = time.time() - t0

    w, h = camera.image_width, camera.image_height
    n_pixels = w * h

    px = jnp.asarray(np.arange(batch_size) % w, jnp.uint32)
    py = jnp.asarray((np.arange(batch_size) // w) % h, jnp.uint32)
    seed = jnp.uint32(0)

    # warmup / compile
    t0 = time.time()
    out = r._batch_fn(r.pack, px, py, jnp.zeros((batch_size,), jnp.uint32), seed)
    out.block_until_ready()
    compile_s = time.time() - t0

    # timed batches (distinct sample ids -> no cached results)
    t0 = time.time()
    acc = None
    for s in range(n_batches):
        sample_id = jnp.full((batch_size,), s, jnp.uint32)
        out = r._batch_fn(r.pack, px, py, sample_id, seed)
        acc = out if acc is None else acc + out
    acc.block_until_ready()
    elapsed = time.time() - t0

    lanes = n_batches * batch_size
    value = lanes / elapsed
    result = {
        "metric": (
            f"pixel-samples/s fwd {scene_name} {w}x{h} depth={max_depth} "
            f"(1 chip; scene build {build_s:.1f}s, compile {compile_s:.1f}s)"
        ),
        "value": round(value, 1),
        "unit": "pixel-samples/s",
        "vs_baseline": round(value / BASELINE_PIXEL_SAMPLES_PER_S, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
