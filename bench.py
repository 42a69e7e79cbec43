#!/usr/bin/env python
"""Benchmark harness — run by the driver on real TPU hardware.

Measures on the cornell_dragon benchmark (1200x1200, ~870k tris; a
procedural stand-in replaces the stripped dragon OBJ):

  1. forward path-tracing throughput through the production render path —
     the persistent ray-pool renderer (render/pool.py), and
  2. forward+backward throughput: one jax.grad step of an image loss
     w.r.t. every float scene parameter (geometry, materials, texture
     constants) through the differentiable integrator.

Prints ONE JSON line (driver contract); the backward number rides along
as extra keys:

  {"metric": ..., "value": N, "unit": "pixel-samples/s",
   "vs_baseline": N, "fwd_bwd_pixel_samples_per_s": N, ...}

Baseline: the reference renders cornell_dragon 1200x1200@1000spp in ~41 min
on an M3 Pro with 10 threads ~= 0.59 M pixel-samples/s (BASELINE.md).

Knobs (env): RRT_BENCH_SCENE, RRT_BENCH_WIDTH, RRT_BENCH_SPP,
RRT_BENCH_LANES, RRT_BENCH_DEPTH, RRT_BENCH_SKIP_BWD,
RRT_BENCH_KERNEL (auto|wavefront|jnp).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PIXEL_SAMPLES_PER_S = 0.59e6  # BASELINE.md cornell_dragon


def bench_backward(pack, static, camera, n_lanes=1 << 15, depth=20):
    """One-sample-per-lane differentiable render step: d(loss)/d(pack)
    for an L2 loss against a target image patch.  Returns
    (pixel-samples/s, rays/s) for the fused forward+backward step."""
    import jax
    import jax.numpy as jnp

    from rust_raytracer_tpu.core import rng as vrng
    from rust_raytracer_tpu.render import integrator

    w = np.uint32(camera.image_width)
    px = jnp.asarray(np.arange(n_lanes) % camera.image_width, jnp.uint32)
    py = jnp.asarray(
        (np.arange(n_lanes) // camera.image_width) % camera.image_height,
        jnp.uint32,
    )
    sample = jnp.zeros((n_lanes,), jnp.uint32)
    target = jnp.zeros((n_lanes, 3), jnp.float32)

    def loss_fn(pack, seed):
        ctx = vrng.Ctx(pixel=py * w + px, sample=sample,
                       bounce=jnp.uint32(0), seed=seed)
        org, dirn = camera.generate_rays(px, py, sample, ctx, jnp.float32)
        rad = integrator.trace(pack, static, org, dirn, ctx, depth, 0.25,
                               differentiable=True)
        return jnp.mean((rad - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn, allow_int=True))
    g = grad_fn(pack, jnp.uint32(0))  # compile
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    reps = 3
    t0 = time.time()
    for r in range(reps):
        g = grad_fn(pack, jnp.uint32(r + 1))
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    dt = (time.time() - t0) / reps
    return n_lanes / dt, n_lanes * depth / dt


def kernel_parity_check(pack, camera, n_rays=1 << 14):
    """Scene-scale traversal-kernel cross-check on the bench scene: trace
    one batch of primary rays through every available triangle kernel and
    compare hits.  Returns a dict of agreement fractions (t-agreement is
    the correctness signal; id ties can legitimately break differently
    when equal-t hits exist).  Never raises — the bench must survive."""
    import jax
    import jax.numpy as jnp

    from rust_raytracer_tpu.core import rng as vrng
    from rust_raytracer_tpu.ops import intersect as isect

    out = {}
    try:
        w = np.uint32(camera.image_width)
        px = jnp.asarray(np.arange(n_rays) * 7 % camera.image_width,
                         jnp.uint32)
        py = jnp.asarray((np.arange(n_rays) * 13 // camera.image_width)
                         % camera.image_height, jnp.uint32)
        smp = jnp.zeros((n_rays,), jnp.uint32)
        ctx = vrng.Ctx(pixel=py * w + px, sample=smp, bounce=jnp.uint32(0),
                       seed=jnp.uint32(0))
        org, dirn = camera.generate_rays(px, py, smp, ctx, jnp.float32)
        t_min = jnp.full((n_rays,), 1e-3, jnp.float32)
        t_max = jnp.full((n_rays,), 3.4e38, jnp.float32)

        results = {}
        for kern in ("jnp", "pallas", "wavefront"):
            t, i = jax.jit(
                lambda o, d, k=kern: isect.intersect_triangles(
                    pack, o, d, t_min, t_max, kernel=k)
            )(org, dirn)
            results[kern] = (np.asarray(t), np.asarray(i))
        t0, i0 = results["jnp"]
        tt0 = np.where(i0 >= 0, t0, 0.0)
        for kern in ("pallas", "wavefront"):
            t, i = results[kern]
            tt = np.where(i >= 0, t, 0.0)
            t_agree = float(
                (np.abs(tt - tt0) <= 1e-4 + 1e-4 * np.abs(tt0)).mean()
            )
            out[f"{kern}_t_agree"] = round(t_agree, 5)
            out[f"{kern}_id_agree"] = round(float((i == i0).mean()), 5)
    except Exception as e:  # noqa: BLE001
        out["error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rust_raytracer_tpu import models
    from rust_raytracer_tpu.render import pool as poolmod
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg
    from rust_raytracer_tpu.utils import metrics as metricsmod

    scene_name = os.environ.get("RRT_BENCH_SCENE", "cornell_dragon")
    width = int(os.environ.get("RRT_BENCH_WIDTH", "1200"))
    spp = int(os.environ.get("RRT_BENCH_SPP", "2"))
    n_lanes = int(os.environ.get("RRT_BENCH_LANES", str(1 << 18)))
    max_depth = int(os.environ.get("RRT_BENCH_DEPTH", "20"))
    kernel = os.environ.get("RRT_BENCH_KERNEL", "auto")

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
    step = poolmod.make_step(r.pack, r.static, camera, total, spp, 0,
                             kernel=kernel)
    t0 = time.time()
    state = step(r.pack, state)
    jax.block_until_ready(state.accum)
    compile_s = time.time() - t0
    del state

    # timed: full pool render of the (pixel, sample) grid, with live
    # occupancy/throughput counters (utils/metrics.py)
    metrics = metricsmod.RenderMetrics(
        n_pixels=n_pixels, spp=spp, max_depth=max_depth
    )
    t0 = time.time()
    accum = poolmod.render_pool(
        r.pack, r.static, camera, n_pixels, spp, n_lanes, seed=0,
        metrics=metrics, kernel=kernel,
    )
    jax.block_until_ready(accum)
    elapsed = time.time() - t0
    metrics.emit(stream=sys.stderr)

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
        "lane_bounces_per_s": round(metrics.summary()["rays_per_s"], 1),
    }

    if not os.environ.get("RRT_BENCH_SKIP_PARITY"):
        parity = kernel_parity_check(r.pack, camera)
        result["kernel_parity"] = parity
        bad = [k for k, v in parity.items()
               if k.endswith("_t_agree") and v < 0.999]
        if bad:
            result["kernel_parity_warning"] = (
                f"t-agreement below 99.9% for {bad}"
            )

    # Insurance print: the forward number must never be lost to a failure
    # in the backward rider (BENCH_r03 lost the whole round to exactly
    # that).  The final combined line below is the one the driver parses;
    # this one goes to stderr for the humans reading the log.
    print(json.dumps(result), file=sys.stderr, flush=True)

    if not os.environ.get("RRT_BENCH_SKIP_BWD"):
        bwd_depth = int(os.environ.get("RRT_BENCH_BWD_DEPTH", "20"))
        bwd_lanes = int(os.environ.get("RRT_BENCH_BWD_LANES", str(1 << 15)))
        try:
            t0 = time.time()
            bwd_ps, bwd_rays = bench_backward(
                r.pack, r.static, camera, n_lanes=bwd_lanes, depth=bwd_depth
            )
            result["fwd_bwd_pixel_samples_per_s"] = round(bwd_ps, 1)
            result["fwd_bwd_rays_per_s"] = round(bwd_rays, 1)
            result["fwd_bwd_config"] = (
                f"jax.grad of image loss wrt all float scene params, "
                f"{bwd_lanes} lanes x depth {bwd_depth} "
                f"(compile+run {time.time() - t0:.0f}s)"
            )
        except Exception as e:  # noqa: BLE001 — bwd must never kill fwd
            result["fwd_bwd_error"] = f"{type(e).__name__}: {e}"[:400]
            print(f"bench_backward failed: {e}", file=sys.stderr)

    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
