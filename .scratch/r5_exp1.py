"""Exp A: replace argsort+gather-apply with multi-operand lax.sort.
Exp B: scatter-add with out-of-range indices for non-retired rows."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu.render import integrator as integ

d = np.load("/root/repo/.scratch/steady_r5.npz")
org = jnp.asarray(d["org"]); dirn = jnp.asarray(d["dirn"])
alive = jnp.asarray(d["alive"]); pixel = jnp.asarray(d["pixel"])
sample = jnp.asarray(d["sample"]); bounce = jnp.asarray(d["bounce"])
N = org.shape[0]
throughput = jnp.ones((N, 3), jnp.float32)
radiance = jnp.ones((N, 3), jnp.float32)
n_pixels = 1200 * 1200

def bench(f, label, reps=8):
    o = f(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.time()-t0)/reps)
    print(f"RESULT {label:44s} {best*1e3:8.1f} ms", flush=True)

# --- baseline: argsort + gather all arrays ---
@jax.jit
def base(org, dirn, alive, throughput, radiance, pixel, sample, bounce):
    perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
    return (org[perm], dirn[perm], throughput[perm], radiance[perm],
            pixel[perm], sample[perm], bounce[perm], alive[perm])
bench(lambda: base(org, dirn, alive, throughput, radiance, pixel, sample,
                   bounce), "argsort + gather-apply (baseline)")

# --- A1: one lax.sort with all payload columns ---
@jax.jit
def msort(org, dirn, alive, throughput, radiance, pixel, sample, bounce):
    key = integ._compaction_key(org, dirn, alive)
    ops = (key,
           org[:, 0], org[:, 1], org[:, 2],
           dirn[:, 0], dirn[:, 1], dirn[:, 2],
           throughput[:, 0], throughput[:, 1], throughput[:, 2],
           radiance[:, 0], radiance[:, 1], radiance[:, 2],
           pixel, sample, bounce, alive)
    out = lax.sort(ops, num_keys=1)
    o = jnp.stack(out[1:4], 1); dd = jnp.stack(out[4:7], 1)
    tp = jnp.stack(out[7:10], 1); rd = jnp.stack(out[10:13], 1)
    return (o, dd, tp, rd) + out[13:]
bench(lambda: msort(org, dirn, alive, throughput, radiance, pixel, sample,
                    bounce), "multi-operand lax.sort (16 payloads)")

# --- A2: sort key+iota, then gather (same as argsort) but gather from
# (3, N) transposed layout ---
orgT = jnp.asarray(np.asarray(d["org"]).T.copy())
dirT = jnp.asarray(np.asarray(d["dirn"]).T.copy())
@jax.jit
def gatherT(orgT, dirT, alive, pixel):
    key = integ._compaction_key(orgT.T, dirT.T, alive)
    perm = jnp.argsort(key)
    return orgT[:, perm], dirT[:, perm], pixel[perm]
bench(lambda: gatherT(orgT, dirT, alive, pixel), "gather along minor axis of (3,N)")

# --- A3: argsort + gather of a PACKED (N, 16) row blob ---
blob = jnp.concatenate([org, dirn, throughput, radiance,
                        pixel[:, None].astype(jnp.float32),
                        sample[:, None].astype(jnp.float32),
                        bounce[:, None].astype(jnp.float32),
                        alive[:, None].astype(jnp.float32)], axis=1)
@jax.jit
def packed(blob, org, dirn, alive):
    perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
    return blob[perm]
bench(lambda: packed(blob, org, dirn, alive), "gather one packed (N,16) blob")

# --- B: scatter-add variants ---
retired = np.asarray(alive) & (np.random.default_rng(0).random(N) < 0.2)
retired = jnp.asarray(retired)
acc0 = jnp.zeros((n_pixels, 3), jnp.float32)

scat0 = jax.jit(lambda a, p, r, m: a.at[p].add(jnp.where(m[:, None], r, 0.0), mode="drop"))
bench(lambda: scat0(acc0, pixel, radiance, retired), "scatter masked-zeros (baseline)")

scat1 = jax.jit(lambda a, p, r, m: a.at[jnp.where(m, p, jnp.uint32(n_pixels))].add(r, mode="drop"))
bench(lambda: scat1(acc0, pixel, radiance, retired), "scatter dropped-rows for non-retired")

# scatter only 1/4 of rows (cost scaling probe)
scat2 = jax.jit(lambda a, p, r, m: a.at[jnp.where(m, p, jnp.uint32(n_pixels))[:N//4]].add(r[:N//4], mode="drop"))
bench(lambda: scat2(acc0, pixel, radiance, retired), "scatter 65k rows (scaling probe)")
