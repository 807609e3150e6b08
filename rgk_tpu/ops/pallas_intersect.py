"""Pallas TPU kernel: closest-hit ray-triangle sweep for flat scenes.

The hot op of the renderer (SURVEY "hard parts" #1).  The pure-JAX
GEMM intersector (ops/intersect.py) streams [R, M] planes through HBM;
this kernel keeps the whole triangle coefficient table *resident in
VMEM* and computes each ray block's sweep entirely on-chip — HBM
traffic drops to the ray inputs and hit outputs only.

Layout (see pallas_guide.md "Tiling Constraints"): the sweep runs on
[Mp, BLK] tiles with *triangles on the sublane axis* and *rays on the
lane axis*.  With small triangle counts this wastes only the pad to a
sublane multiple (8) instead of the pad to a lane multiple (128) —
an 8-16x VPU-occupancy win for corpus-sized scenes.  Triangle
coefficients broadcast as [Mp, 1] columns, ray components as [1, BLK]
rows; the winner reduces over the sublane axis.

Scope: scenes whose Badouel pack fits VMEM (M up to a few thousand —
the entire in-repo reference corpus).  Larger scenes use the BVH
path; a two-level cluster kernel is the follow-up.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

_PARALLEL_EPS = 1e-9
DEFAULT_BLOCK = 2048
_BIG = 3.4e38


# Sublane tile of the triangle sweep.  [MT, BLK] planes must fit VMEM
# alongside the pack: MT * BLK * 4 B * ~6 live planes — 256 x 2048
# keeps the working set ~12 MB below the 16 MB budget (a single
# untiled sweep OOMs VMEM beyond ~1k triangles).
M_TILE = 256


def _sweep_tile(pack_tile, base_id, rays, tmin, tmax, excl, state):
    """One [MT, BLK] Badouel sweep merged into running best state."""
    rox, roy, roz, rdx, rdy, rdz = rays
    best_t, best_i, best_b, best_c = state

    def coef(j):
        return pack_tile[:, j][:, None]  # [MT, 1]

    nx, ny, nz, d = coef(0), coef(1), coef(2), coef(3)
    rddn = rdx * nx + rdy * ny + rdz * nz          # [MT, BLK]
    rodn = rox * nx + roy * ny + roz * nz + d
    safe = jnp.abs(rddn) > _PARALLEL_EPS
    t = -rodn / jnp.where(safe, rddn, 1.0)

    b0, bvx, bvy, bvz = coef(4), coef(5), coef(6), coef(7)
    beta = (b0 + rox * bvx + roy * bvy + roz * bvz
            + t * (rdx * bvx + rdy * bvy + rdz * bvz))
    g0, gvx, gvy, gvz = coef(8), coef(9), coef(10), coef(11)
    gamma = (g0 + rox * gvx + roy * gvy + roz * gvz
             + t * (rdx * gvx + rdy * gvy + rdz * gvz))

    glass = coef(12) > 0.5
    tri_ids = base_id + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > tmin) & (t < tmax) & ~glass & (tri_ids != excl))

    t_sel = jnp.where(ok, t, _BIG)
    tile_t = jnp.min(t_sel, axis=0)                      # [BLK]
    onehot = t_sel == tile_t[None, :]
    # First matching triangle wins ties (argmin semantics).
    tile_i = jnp.min(jnp.where(onehot, tri_ids, jnp.int32(0x7FFFFFFF)),
                     axis=0)
    first = tri_ids == tile_i[None, :]
    tile_b = jnp.sum(jnp.where(first, beta, 0.0), axis=0)
    tile_c = jnp.sum(jnp.where(first, gamma, 0.0), axis=0)

    # Tiles sweep ascending triangle ids, so a strict < keeps the
    # lowest-index winner on exact t ties.
    win = tile_t < best_t
    return (jnp.where(win, tile_t, best_t),
            jnp.where(win, tile_i, best_i),
            jnp.where(win, tile_b, best_b),
            jnp.where(win, tile_c, best_c))


def _sweep_tile_any(pack_tile, base_id, rays, tmin, tmax, excl, best_t):
    """Any-hit variant of one [MT, BLK] sweep: no winner extraction —
    only "does an accepted hit exist" (and a witness t) per lane.
    The reference's FindIntersectKdAny semantics
    (src/scene_intersect.cpp:118-208): shadow/visibility rays need a
    boolean, not the closest triangle."""
    rox, roy, roz, rdx, rdy, rdz = rays

    def coef(j):
        return pack_tile[:, j][:, None]  # [MT, 1]

    nx, ny, nz, d = coef(0), coef(1), coef(2), coef(3)
    rddn = rdx * nx + rdy * ny + rdz * nz
    rodn = rox * nx + roy * ny + roz * nz + d
    safe = jnp.abs(rddn) > _PARALLEL_EPS
    t = -rodn / jnp.where(safe, rddn, 1.0)

    b0, bvx, bvy, bvz = coef(4), coef(5), coef(6), coef(7)
    beta = (b0 + rox * bvx + roy * bvy + roz * bvz
            + t * (rdx * bvx + rdy * bvy + rdz * bvz))
    g0, gvx, gvy, gvz = coef(8), coef(9), coef(10), coef(11)
    gamma = (g0 + rox * gvx + roy * gvy + roz * gvz
             + t * (rdx * gvx + rdy * gvy + rdz * gvz))

    glass = coef(12) > 0.5
    tri_ids = base_id + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > tmin) & (t < tmax) & ~glass & (tri_ids != excl))
    return jnp.minimum(best_t, jnp.min(jnp.where(ok, t, _BIG), axis=0))


def _kernel(pack_ref, rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref,
            rdz_ref, tmin_ref, tmax_ref, excl_ref,
            t_ref, idx_ref, bb_ref, bc_ref, *, any_hit=False):
    def ray(ref):
        return ref[...][None, :]        # [1, BLK]

    rays = (ray(rox_ref), ray(roy_ref), ray(roz_ref),
            ray(rdx_ref), ray(rdy_ref), ray(rdz_ref))
    tmin = tmin_ref[...][None, :]
    tmax = tmax_ref[...][None, :]
    excl = excl_ref[...][None, :]

    blk = rox_ref.shape[0]
    mp = pack_ref.shape[0]

    if any_hit:
        best_t = jnp.full((blk,), _BIG, jnp.float32)
        if mp <= M_TILE:
            best_t = _sweep_tile_any(pack_ref[...], jnp.int32(0), rays,
                                     tmin, tmax, excl, best_t)
        else:
            n_tiles = mp // M_TILE

            # Early exit once every lane in the block has a hit —
            # plus no per-tile winner extraction at all; occlusion-
            # heavy shadow batches stop after the first few tiles.
            def cond(st):
                i, best = st
                return (i < n_tiles) & ~jnp.all(best < _BIG)

            def body(st):
                i, best = st
                tile = pack_ref[pl.ds(i * M_TILE, M_TILE), :]
                return (i + 1,
                        _sweep_tile_any(tile, i * M_TILE, rays, tmin,
                                        tmax, excl, best))

            _, best_t = jax.lax.while_loop(
                cond, body, (jnp.int32(0), best_t))
        found = best_t < _BIG
        t_ref[...] = best_t
        # Witness hit only: triangle id/barycentrics are not tracked
        # (visibility() consumes hit.valid alone).
        idx_ref[...] = jnp.where(found, 0, -1)
        bb_ref[...] = jnp.zeros((blk,), jnp.float32)
        bc_ref[...] = jnp.zeros((blk,), jnp.float32)
        return

    state = (jnp.full((blk,), _BIG, jnp.float32),
             jnp.full((blk,), 0x7FFFFFFF, jnp.int32),
             jnp.zeros((blk,), jnp.float32),
             jnp.zeros((blk,), jnp.float32))
    if mp <= M_TILE:
        state = _sweep_tile(pack_ref[...], jnp.int32(0), rays, tmin,
                            tmax, excl, state)
    else:
        # fori_loop (not an unrolled Python loop): Mosaic reuses one
        # tile's temporaries across iterations; unrolling kept every
        # tile's [MT, BLK] planes live and OOMed scoped VMEM.
        assert mp % M_TILE == 0, "pack must be padded to M_TILE"

        def tile_step(i, st):
            tile = pack_ref[pl.ds(i * M_TILE, M_TILE), :]
            return _sweep_tile(tile, i * M_TILE, rays, tmin, tmax,
                               excl, st)

        state = jax.lax.fori_loop(0, mp // M_TILE, tile_step, state)
    best_t, best_i, best_b, best_c = state
    found = best_t < _BIG

    t_ref[...] = best_t
    idx_ref[...] = jnp.where(found, best_i, -1)
    bb_ref[...] = jnp.where(found, best_b, 0.0)
    bc_ref[...] = jnp.where(found, best_c, 0.0)


def prepare_pack_mp(tri_pack: np.ndarray) -> np.ndarray:
    """[M, 12|13] Badouel pack -> [Mp, 16] sublane-padded.

    Padding rows have n == 0 (parallel-rejected) and glass == 1.
    """
    pack = np.asarray(tri_pack, np.float32)
    m = pack.shape[0]
    if pack.shape[1] < 13:  # no thin-glass column
        pack = np.concatenate(
            [pack, np.zeros((m, 1), np.float32)], axis=1)
    # Pad to a sublane multiple; multi-tile packs pad to whole M_TILEs
    # for the kernel's fori_loop over tiles.
    mp = max(8, -(-m // 8) * 8)
    if mp > M_TILE:
        mp = -(-m // M_TILE) * M_TILE
    out = np.zeros((mp, 16), np.float32)
    out[:m, :13] = pack
    out[m:, 12] = 1.0  # padding rows masked as glass
    return out


@partial(jax.jit, static_argnames=("block", "interpret"))
def _run(pack_mp, rox, roy, roz, rdx, rdy, rdz, t_min, t_max, exclude,
         block, interpret):
    R = rox.shape[0]
    n_blocks = R // block
    grid = (n_blocks,)

    lane_spec = pl.BlockSpec((block,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((R,), jnp.float32),
        jax.ShapeDtypeStruct((R,), jnp.int32),
        jax.ShapeDtypeStruct((R,), jnp.float32),
        jax.ShapeDtypeStruct((R,), jnp.float32),
    )
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]  # pack (whole)
        + [lane_spec] * 9,
        out_specs=(lane_spec, lane_spec, lane_spec, lane_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(pack_mp, rox, roy, roz, rdx, rdy, rdz, t_min, t_max, exclude)


def intersect_pallas(scene, ro, rd, t_min, t_max, exclude=None,
                     any_hit: bool = False, block: int = DEFAULT_BLOCK,
                     interpret: bool = False) -> Hit:
    """Drop-in intersector backed by the Pallas kernel.

    Requires `scene.pack_mp` ([Mp, 16], prepare_pack_mp).  Ray counts
    are padded to a block multiple internally.
    """
    R = ro.shape[0]
    Rp = -(-R // block) * block
    pad = Rp - R

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if exclude is None:
        exclude = jnp.full((R,), -1, jnp.int32)

    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    if pad:
        zf = lambda a: jnp.pad(a, (0, pad))
        rox, roy, roz = zf(rox), zf(roy), zf(roz)
        rdx, rdy, rdz = zf(rdx), zf(rdy), zf(rdz)
        t_min, t_max, exclude = zf(t_min), zf(t_max), zf(exclude)

    t, idx, bb, bc = _run(scene.pack_mp, rox, roy, roz, rdx, rdy, rdz,
                          t_min, t_max, exclude, block, interpret)
    if pad:
        t, idx, bb, bc = t[:R], idx[:R], bb[:R], bc[:R]
    return Hit(t=t, tri=idx, bary_b=bb, bary_c=bc)
