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

Measurement discipline (r4 lesson, .scratch/PERF_NOTES.md): the TPU
tunnel's throughput varies run-to-run by +-10-20% and any concurrent job
can halve it, so the timed render runs RRT_BENCH_PASSES (default 2)
times and the BEST pass is reported — a single-pass number is a coin
flip.  spp=12 keeps the pool >=90% occupied (at 2spp the drain tail was
a third of wall time, undercounting steady-state throughput).

Baseline: the reference renders cornell_dragon 1200x1200@1000spp in ~41 min
on an M3 Pro with 10 threads ~= 0.59 M pixel-samples/s (BASELINE.md).

Knobs (env): RRT_BENCH_SCENE, RRT_BENCH_WIDTH, RRT_BENCH_SPP,
RRT_BENCH_LANES, RRT_BENCH_DEPTH, RRT_BENCH_PASSES, RRT_BENCH_SKIP_BWD,
RRT_BENCH_SKIP_PARITY, RRT_BENCH_KERNEL (auto|wavefront|pallas|jnp).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PIXEL_SAMPLES_PER_S = 0.59e6  # BASELINE.md cornell_dragon


def bench_backward(pack, static, camera, n_lanes=1 << 15, depth=20,
                   remat=None):
    """One-sample-per-lane differentiable render step: d(loss)/d(pack)
    for an L2 loss against a target image patch.  Returns
    (pixel-samples/s, rays/s) for the fused forward+backward step.

    remat: integrator.trace residual policy — default "none" (save every
    bounce's residuals; fastest, measured 98k vs 79k for "hits" at 2^15
    lanes) with automatic fallback to "hits" if the save-all program
    fails to fit."""
    import jax
    import jax.numpy as jnp

    from rust_raytracer_tpu.core import rng as vrng
    from rust_raytracer_tpu.render import integrator

    if remat is None:
        remat = os.environ.get("RRT_BENCH_BWD_REMAT", "none")
    w = np.uint32(camera.image_width)
    px = jnp.asarray(np.arange(n_lanes) % camera.image_width, jnp.uint32)
    py = jnp.asarray(
        (np.arange(n_lanes) // camera.image_width) % camera.image_height,
        jnp.uint32,
    )
    sample = jnp.zeros((n_lanes,), jnp.uint32)
    target = jnp.zeros((n_lanes, 3), jnp.float32)

    def make_grad(remat_mode):
        def loss_fn(pack, seed):
            ctx = vrng.Ctx(pixel=py * w + px, sample=sample,
                           bounce=jnp.uint32(0), seed=seed)
            org, dirn = camera.generate_rays(px, py, sample, ctx,
                                             jnp.float32)
            # compact=False: the compaction sort's gathers differentiate
            # to narrow row scatters, which cost more in the backward
            # sweep than the packet coherence buys the forward (91.5 vs
            # 112.9k ps/s measured); the estimator is identical either
            # way (counter-based RNG)
            rad = integrator.trace(pack, static, org, dirn, ctx, depth,
                                   0.25, compact=False,
                                   differentiable=True,
                                   remat=remat_mode)
            return jnp.mean((rad - target) ** 2)

        return jax.jit(jax.grad(loss_fn, allow_int=True))

    try:
        grad_fn = make_grad(remat)
        g = grad_fn(pack, jnp.uint32(0))  # compile
        jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    except Exception:  # noqa: BLE001 — e.g. save-all residuals OOM
        if remat == "hits":
            raise
        print(f"bench_backward: remat={remat} failed, retrying with "
              "remat=hits", file=sys.stderr)
        grad_fn = make_grad("hits")
        g = grad_fn(pack, jnp.uint32(0))
        jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    reps = 3
    t0 = time.time()
    for r in range(reps):
        g = grad_fn(pack, jnp.uint32(r + 1))
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    dt = (time.time() - t0) / reps
    return n_lanes / dt, n_lanes * depth / dt


def kernel_parity_check(pack, camera, n_rays=1 << 14):
    """Scene-scale traversal-kernel cross-check on the bench scene, on
    PRIMARY rays and on an incoherent BOUNCE-like wavefront (origins at
    the primary hit points, pseudo-random directions): trace through
    every available triangle kernel and compare hits.  t-agreement is
    the correctness signal; id ties can legitimately break differently
    when equal-t hits exist.  The bounce check is the one that exercises
    the wavefront pipeline's capacity caps (primary rays are coherent
    and never overflow).  Never raises — the bench must survive."""
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

        def run_all(org, dirn, tag):
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
                out[f"{kern}_{tag}t_agree"] = round(t_agree, 5)
                out[f"{kern}_{tag}id_agree"] = round(float((i == i0).mean()), 5)
            return results["jnp"]

        t_j, i_j = run_all(org, dirn, "")

        # bounce-like wavefront: origins at the primary hit points,
        # directions from a cheap hash — incoherent like a real bounce
        hit = i_j >= 0
        t_h = jnp.asarray(np.where(hit, t_j, 1.0), jnp.float32)
        org2 = org + dirn * t_h[:, None]
        r = np.random.default_rng(0)
        d2 = r.normal(size=(n_rays, 3)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        run_all(org2, jnp.asarray(d2), "bounce_")
    except Exception as e:  # noqa: BLE001
        out["error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def image_parity_check(scene, spp=2, width=200):
    """Scene-scale IMAGE parity of the production TPU wavefront kernel vs
    the exact BVH8 packet walk (itself verified against the jnp oracle in
    tests/): render the bench scene small with both and compare.  The
    samples are identical (counter-based RNG, same (pixel, sample) grid),
    so a lane's radiance differs ONLY where the wavefront kernel's
    capacity caps dropped a hit somewhere along its path — the per-lane
    disagreement fraction and the image-level mean relative error measure
    the approximation end to end (reference contract: mesh.rs:61-101
    exactness).  Returns a dict; never raises."""
    import jax
    import jax.numpy as jnp

    from rust_raytracer_tpu.core import rng as vrng
    from rust_raytracer_tpu.render import integrator
    from rust_raytracer_tpu.render.renderer import Renderer
    from rust_raytracer_tpu.utils import config as cfg

    out = {}
    try:
        scene_config = cfg.merge_scene_config(
            scene.config, {"output_width": width})
        render_cfg = cfg.RenderConfig(samples_per_pixel=spp, max_depth=20)
        cam = cfg.make_camera(scene_config, render_cfg)
        n_pixels = cam.image_width * cam.image_height
        r = Renderer(scene, cam, batch_size=1 << 15)

        chunk = 1 << 16
        total = n_pixels * spp
        n_chunks = -(-total // chunk)
        w = np.uint32(cam.image_width)

        def render(kern):
            fn = jax.jit(
                lambda o, d, c: integrator.trace(
                    r.pack, r.static, o, d, c, 20, cam.light_bias,
                    kernel=kern)
            )
            rads = []
            for ci in range(n_chunks):
                flat = (np.arange(chunk, dtype=np.int64) + ci * chunk) % total
                pix = (flat // spp).astype(np.uint32)
                smp = (flat % spp).astype(np.uint32)
                px = jnp.asarray(pix % w)
                py = jnp.asarray(pix // w)
                ctx = vrng.Ctx(pixel=jnp.asarray(pix), sample=jnp.asarray(smp),
                               bounce=jnp.uint32(0), seed=jnp.uint32(0))
                org, dirn = cam.generate_rays(px, py, jnp.asarray(smp), ctx,
                                              jnp.float32)
                rads.append(np.asarray(fn(org, dirn, ctx))[
                    :total - ci * chunk if ci == n_chunks - 1 else chunk])
            return np.concatenate(rads, axis=0)

        a = render("wavefront")
        b = render("pallas")
        scale = max(float(np.mean(b)), 1e-6)
        lane_off = np.any(np.abs(a - b) > 1e-3 * scale + 1e-3 * np.abs(b),
                          axis=-1)
        out["lane_agree"] = round(1.0 - float(lane_off.mean()), 6)
        out["image_mean_rel_err"] = round(
            float(np.mean(np.abs(a - b))) / scale, 6)
        out["config"] = f"{cam.image_width}x{cam.image_height}@{spp}spp d20"
        # per-bounce id disagreement ~0.1% compounds over ~5-bounce mean
        # paths: expect lane_agree ~0.995+; warn below 0.99
        if out["image_mean_rel_err"] > 1e-2 or out["lane_agree"] < 0.99:
            out["warning"] = (
                f"wavefront radiance deviates from the exact kernel: "
                f"lane_agree={out['lane_agree']}, mean rel err "
                f"{out['image_mean_rel_err']:.2%}"
            )
    except Exception as e:  # noqa: BLE001
        out["error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def sharded_smoke(scene):
    """Run the production multi-chip path (shard_map over a Mesh) on a
    1-device TPU mesh with the wavefront kernel — the sharded code path
    executes on real hardware at least once per bench (VERDICT r4 #7).
    Returns 'ok' or the error string."""
    try:
        import jax
        from jax.sharding import Mesh

        from rust_raytracer_tpu.render import pool as poolmod
        from rust_raytracer_tpu.render.renderer import Renderer
        from rust_raytracer_tpu.utils import config as cfg

        mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
        scene_config = cfg.merge_scene_config(
            scene.config, {"output_width": 128})
        render_cfg = cfg.RenderConfig(samples_per_pixel=1, max_depth=8)
        cam = cfg.make_camera(scene_config, render_cfg)
        n_pixels = cam.image_width * cam.image_height
        r = Renderer(scene, cam, batch_size=1 << 14)
        accum = poolmod.render_pool(
            r.pack, r.static, cam, n_pixels, 1, 1 << 14, seed=0,
            kernel="auto", mesh=mesh,
        )
        a = np.asarray(accum)
        assert a.shape == (n_pixels, 3) and np.isfinite(a).all()
        assert a.max() > 0
        return "ok"
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {e}"[:200]


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
    spp = int(os.environ.get("RRT_BENCH_SPP", "12"))
    n_lanes = int(os.environ.get("RRT_BENCH_LANES", str(1 << 18)))
    max_depth = int(os.environ.get("RRT_BENCH_DEPTH", "20"))
    kernel = os.environ.get("RRT_BENCH_KERNEL", "auto")
    passes = int(os.environ.get("RRT_BENCH_PASSES", "2"))

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

    # timed: full pool renders of the (pixel, sample) grid; best of
    # `passes` runs defends against tunnel throughput variance
    best = None
    for p in range(passes):
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
        if best is None or elapsed < best[0]:
            best = (elapsed, metrics)
        del accum
    elapsed, metrics = best
    msum = metrics.summary()

    value = total / elapsed
    result = {
        "metric": (
            f"pixel-samples/s fwd {scene_name} {w}x{h}@{spp}spp depth={max_depth} "
            f"pool renderer (1 chip; best of {passes} passes; scene build "
            f"{build_s:.1f}s, compile {compile_s:.1f}s)"
        ),
        "value": round(value, 1),
        "unit": "pixel-samples/s",
        "vs_baseline": round(value / BASELINE_PIXEL_SAMPLES_PER_S, 3),
        "lane_bounces_per_s": round(msum["rays_per_s"], 1),
        "mean_occupancy_frac": round(msum["mean_occupancy"] / n_lanes, 3),
        "wf_overflow_frac": round(msum.get("wf_overflow_frac", 0.0), 6),
    }

    if not os.environ.get("RRT_BENCH_SKIP_PARITY"):
        parity = kernel_parity_check(r.pack, camera)
        result["kernel_parity"] = parity
        bad = [k for k, v in parity.items()
               if k.endswith("t_agree") and v < 0.999]
        if bad:
            result["kernel_parity_warning"] = (
                f"t-agreement below 99.9% for {bad}"
            )
        result["image_parity"] = image_parity_check(scene)
        result["sharded_smoke"] = sharded_smoke(scene)

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
