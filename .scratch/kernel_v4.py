"""BVH8 kernel v4: bitmask stack — one SMEM entry per (node, hitmask),
pop cost proportional to hit children (ctz via float-exponent trick),
single write-back, single push.  Scalar work per visit ~4x lower than the
8-iteration push loop.  Benchmarked on the steady-state pool wavefront."""
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rust_raytracer_tpu import models
from rust_raytracer_tpu.scene import compiler as sc
from rust_raytracer_tpu.ops import pallas_bvh8 as pb8
from rust_raytracer_tpu.render import integrator as integ

CLUSTER = 128
DET_EPS = 1e-12
BIG = 3.4e38
T_MIN_STATIC = 1e-3
STACK = 64  # entries are whole nodes now; depth bound is ~16


def make_kernel(tile):
    def _kernel(child_s, valid_s, aabb8, ox, oy, oz, dx, dy, dz, tmax_ref,
                tri_ref, t_out, i_out):
        pow2 = jnp.left_shift(
            jnp.int32(1), lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        )

        def run(stack_ref, best_t, best_i, best_t_row):
            def packet(j, _):
                o_xr = ox[pl.ds(j, 1), :]
                o_yr = oy[pl.ds(j, 1), :]
                o_zr = oz[pl.ds(j, 1), :]
                d_xr = dx[pl.ds(j, 1), :]
                d_yr = dy[pl.ds(j, 1), :]
                d_zr = dz[pl.ds(j, 1), :]
                inv_xr = 1.0 / d_xr
                inv_yr = 1.0 / d_yr
                inv_zr = 1.0 / d_zr
                o_xc = o_xr.reshape(tile, 1)
                o_yc = o_yr.reshape(tile, 1)
                o_zc = o_zr.reshape(tile, 1)
                d_xc = d_xr.reshape(tile, 1)
                d_yc = d_yr.reshape(tile, 1)
                d_zc = d_zr.reshape(tile, 1)

                t0 = jnp.minimum(tmax_ref[pl.ds(j, 1), :], BIG)
                best_t[:, :] = t0.reshape(tile, 1)
                best_t_row[0:1, :] = t0
                best_i[:, :] = jnp.full((tile, 1), -1, jnp.int32)

                def aabb_mask(v):
                    """Test the packet against node v's 8 child boxes;
                    returns the int32 hit bitmask."""
                    lo_x = aabb8[v, :, 0:1]
                    lo_y = aabb8[v, :, 1:2]
                    lo_z = aabb8[v, :, 2:3]
                    hi_x = aabb8[v, :, 3:4]
                    hi_y = aabb8[v, :, 4:5]
                    hi_z = aabb8[v, :, 5:6]
                    tx0 = (lo_x - o_xr) * inv_xr
                    tx1 = (hi_x - o_xr) * inv_xr
                    ty0 = (lo_y - o_yr) * inv_yr
                    ty1 = (hi_y - o_yr) * inv_yr
                    tz0 = (lo_z - o_zr) * inv_zr
                    tz1 = (hi_z - o_zr) * inv_zr
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1),
                                    best_t_row[0:1, :]),
                    )
                    anyc = jnp.any(near <= far, axis=1, keepdims=True)
                    return jnp.sum(jnp.where(anyc, pow2, 0))

                # root entry (valid_s masks empty child slots, which the
                # min/max slab formulation would otherwise "hit")
                root_bits = aabb_mask(jnp.int32(0)) & valid_s[0]
                stack_ref[0] = root_bits  # root node id 0 << 8
                sp0 = (root_bits != 0).astype(jnp.int32)

                def cond(sp):
                    return sp > 0

                def body(sp):
                    e = stack_ref[sp - 1]
                    v = lax.shift_right_logical(e, 8)
                    mask = e & 255
                    # lowest set bit + its index via the f32 exponent
                    low = mask & -mask
                    c = ((low >= 2).astype(jnp.int32)
                         + (low >= 4) + (low >= 8) + (low >= 16)
                         + (low >= 32) + (low >= 64) + (low >= 128))
                    rem = mask & (mask - 1)
                    # write back the remaining siblings (or drop the entry)
                    keep = rem != 0
                    sp1 = sp - 1 + keep.astype(jnp.int32)

                    @pl.when(keep)
                    def _():
                        stack_ref[sp - 1] = (e & ~255) | rem

                    child = child_s[v * 8 + c]

                    def leaf_fn(sp1):
                        cluster = -child - 1
                        v0x = tri_ref[cluster, 0:1, :]
                        v0y = tri_ref[cluster, 1:2, :]
                        v0z = tri_ref[cluster, 2:3, :]
                        e1x = tri_ref[cluster, 3:4, :]
                        e1y = tri_ref[cluster, 4:5, :]
                        e1z = tri_ref[cluster, 5:6, :]
                        e2x = tri_ref[cluster, 6:7, :]
                        e2y = tri_ref[cluster, 7:8, :]
                        e2z = tri_ref[cluster, 8:9, :]
                        back = tri_ref[cluster, 9:10, :]

                        px = d_yc * e2z - d_zc * e2y
                        py = d_zc * e2x - d_xc * e2z
                        pz = d_xc * e2y - d_yc * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        dd = jnp.where(back > 0.5, jnp.abs(det), det)
                        ok = dd > DET_EPS
                        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
                        bx = o_xc - v0x
                        by = o_yc - v0y
                        bz = o_zc - v0z
                        u = (bx * px + by * py + bz * pz) * inv_det
                        qx = by * e1z - bz * e1y
                        qy = bz * e1x - bx * e1z
                        qz = bx * e1y - by * e1x
                        w = (d_xc * qx + d_yc * qy + d_zc * qz) * inv_det
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        ok &= (u >= 0.0) & (u <= 1.0) & (w >= 0.0) & (u + w <= 1.0)
                        bt = best_t[:, :]
                        ok &= (t > T_MIN_STATIC) & (t < bt)
                        tt = jnp.where(ok, t, BIG)
                        new_t = jnp.min(tt, axis=1, keepdims=True)
                        new_i = jnp.argmin(tt, axis=1).astype(jnp.int32)[:, None]
                        better = new_t < bt
                        best_i[:, :] = jnp.where(
                            better, cluster * CLUSTER + new_i, best_i[:, :]
                        )
                        nt = jnp.where(better, new_t, bt)
                        best_t[:, :] = nt
                        best_t_row[0:1, :] = nt.reshape(1, tile)
                        return sp1

                    def internal_fn(sp1):
                        bits = aabb_mask(child) & valid_s[child]

                        @pl.when(bits != 0)
                        def _():
                            stack_ref[sp1] = lax.shift_left(child, 8) | bits

                        return sp1 + (bits != 0).astype(jnp.int32)

                    return lax.cond(child < 0, leaf_fn, internal_fn, sp1)

                lax.while_loop(cond, body, sp0)

                t_out[pl.ds(j, 1), :] = best_t[:, :].reshape(1, tile)
                i_out[pl.ds(j, 1), :] = best_i[:, :].reshape(1, tile)
                return 0

            lax.fori_loop(0, ox.shape[0], packet, 0)

        pl.run_scoped(
            run,
            stack_ref=pltpu.SMEM((STACK,), jnp.int32),
            best_t=pltpu.VMEM((tile, 1), jnp.float32),
            best_i=pltpu.VMEM((tile, 1), jnp.int32),
            best_t_row=pltpu.VMEM((8, tile), jnp.float32),
        )

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile",))
def traverse(child8, aabb8, tri_geom, org, dirn, t_max, *, tile=128):
    n = org.shape[0]
    n_tiles = n // tile
    bt = min(max(1, 1024 // tile), n_tiles)

    def rows(a):
        return a.reshape(n_tiles, tile)

    args = [
        rows(org[:, 0]), rows(org[:, 1]), rows(org[:, 2]),
        rows(dirn[:, 0]), rows(dirn[:, 1]), rows(dirn[:, 2]),
        rows(t_max),
    ]
    ray_spec = pl.BlockSpec((bt, tile), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        make_kernel(tile),
        grid=(n_tiles // bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [ray_spec] * 7
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(child8.reshape(-1),
      jnp.sum(jnp.where(child8 != 0,
                        1 << jnp.arange(8, dtype=jnp.int32), 0),
              axis=1).astype(jnp.int32),
      aabb8, *args, tri_geom)
    return t.reshape(n), idx.reshape(n)


def main():
    scene = models.build("cornell_dragon")
    pack, static = sc.compile_scene(scene)
    d = np.load("/root/repo/.scratch/steady_state.npz")
    org = jnp.asarray(d["org"])
    dirn = jnp.asarray(d["dirn"])
    alive = jnp.asarray(d["alive"])
    perm = jnp.argsort(integ._compaction_key(org, dirn, alive))
    org, dirn, alive = org[perm], dirn[perm], alive[perm]
    tmax = jnp.where(alive, BIG, 0.0).astype(jnp.float32)
    org, dirn, tmax = map(jax.block_until_ready, (org, dirn, tmax))

    def bench(f, label, reps=5):
        o = jax.block_until_ready(f())
        t0 = time.time()
        for _ in range(reps):
            o = f()
        jax.block_until_ready(o)
        print(f"{label:30s} {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)
        return o

    prod = jax.jit(lambda o, dd, tm: pb8.intersect_triangles_bvh8(pack, o, dd, 1e-3, tm))
    t_ref, i_ref = bench(lambda: prod(org, dirn, tmax), "production TILE=128")

    for tile in (128, 64):
        f = lambda: traverse(pack.bvh8_child, pack.bvh8_aabb, pack.tri_geom,
                             org, dirn, tmax, tile=tile)
        t_v4, i_v4 = bench(f, f"v4 bitmask TILE={tile}")
        match = float(jnp.mean((i_v4 == i_ref) | ~alive))
        print(f"   id match vs prod: {match:.6f}", flush=True)


if __name__ == "__main__":
    main()
