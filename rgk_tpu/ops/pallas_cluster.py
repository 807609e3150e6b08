"""Pallas TPU kernel: cluster-BVH ray intersection for large scenes.

The re-design of the reference's per-ray kd-tree traversal (reference
src/scene_intersect.cpp FindIntersectKd*) for a vector machine.  A
per-lane tree walk needs per-lane gathers the TPU lacks; instead each
*ray block* walks the small cluster tree once with a scalar cursor:

  while node < n_nodes:
      hit[lane] = slab(node AABB, lane interval)    # [1,BLK] VPU test
      if leaf and any(hit):  DMA the cluster's 128 Badouel rows
                             HBM -> VMEM, dense [128, BLK] sweep,
                             merge per-lane closest hit
      node = any(hit) ? descend : skip-link

Shared traversal trades some wasted sweeps on divergent blocks for
zero gathers and a fully dense inner loop; per-lane best_t keeps
pruning sound.  The cluster tree (2K-1 nodes for K clusters of 128
triangles) lives in SMEM — node AABBs/links are scalar loads, uniform
over the block; the triangle pack stays in HBM and
streams per visited leaf (one lane-aligned [16, 128] tile, 8 KB —
Mosaic requires HBM DMA slices aligned to 128 lanes, so the pack is
stored coefficient-major and transposed to [128, 16] on-chip once per
visited cluster).

Rays ride the lane axis exactly like the flat kernel
(ops/pallas_intersect.py); triangles ride sublanes in the sweep.
See scene/clusters.py for the host-side structure and tile layout
(row 12 = thin-glass never-block flag, row 13 = original triangle id
bitcast to float).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

_PARALLEL_EPS = 1e-9
_BIG = 3.4e38
DEFAULT_BLOCK = 1024
CLUSTER_SIZE = 128  # must match scene/clusters.CLUSTER_SIZE


def _sweep_cluster(tile, rays, tmin, tcap, excl, state):
    """Dense Badouel sweep of one cluster tile against the ray block.

    tile: [16, 128] coefficient-major; rays: 6 x [1, BLK];
    tmin/tcap/excl: [1, BLK]; state: 4 x [1, BLK] (t, id, beta, gamma).
    """
    rox, roy, roz, rdx, rdy, rdz = rays
    best_t, best_i, best_b, best_c = state

    tilt = tile.T  # [128, 16]: triangles to sublanes, one relayout

    def coef(j):
        return tilt[:, j:j + 1]  # [128, 1]

    nx, ny, nz, d = coef(0), coef(1), coef(2), coef(3)
    rddn = rdx * nx + rdy * ny + rdz * nz          # [128, BLK]
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
    pid = pltpu.bitcast(tilt[:, 13:14], jnp.int32)  # [128, 1]
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > tmin) & (t < tcap) & ~glass & (pid != excl))

    t_sel = jnp.where(ok, t, _BIG)
    tile_t = jnp.min(t_sel, axis=0, keepdims=True)       # [1, BLK]
    onehot = t_sel == tile_t
    pid_b = jnp.broadcast_to(pid, t.shape)
    tile_i = jnp.min(jnp.where(onehot, pid_b, jnp.int32(0x7FFFFFFF)),
                     axis=0, keepdims=True)
    first = onehot & (pid_b == tile_i)
    tile_b = jnp.sum(jnp.where(first, beta, 0.0), axis=0, keepdims=True)
    tile_c = jnp.sum(jnp.where(first, gamma, 0.0), axis=0, keepdims=True)

    win = tile_t < best_t
    return (jnp.where(win, tile_t, best_t),
            jnp.where(win, tile_i, best_i),
            jnp.where(win, tile_b, best_b),
            jnp.where(win, tile_c, best_c))


def _make_kernel(any_hit: bool):
    def kernel(nmin_ref, nmax_ref, meta_ref, pack_hbm,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               tmin_ref, tmax_ref, excl_ref,
               t_ref, idx_ref, bb_ref, bc_ref,
               tile_ref, sem_ref):
        n_nodes = meta_ref.shape[0] // 3

        def ray(ref):
            return ref[...][None, :]    # [1, BLK]

        rays = (ray(rox_ref), ray(roy_ref), ray(roz_ref),
                ray(rdx_ref), ray(rdy_ref), ray(rdz_ref))
        rox, roy, roz, rdx, rdy, rdz = rays
        tmin = ray(tmin_ref)
        tmax = ray(tmax_ref)
        excl = ray(excl_ref)

        def inv(c):
            tiny = jnp.where(c >= 0.0, 1e-20, -1e-20)
            return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, tiny)

        invx, invy, invz = inv(rdx), inv(rdy), inv(rdz)

        blk = rox_ref.shape[0]
        state0 = (jnp.full((1, blk), _BIG, jnp.float32),
                  jnp.full((1, blk), -1, jnp.int32),
                  jnp.zeros((1, blk), jnp.float32),
                  jnp.zeros((1, blk), jnp.float32))

        def cond(carry):
            node, state = carry
            in_tree = node < n_nodes
            if any_hit:
                # Shadow rays finish at the first accepted hit.
                return in_tree & jnp.any(state[1] < 0)
            return in_tree

        def body(carry):
            node, state = carry
            best_t = state[0]
            # Node fetches are SCALAR loads from SMEM: the node's AABB
            # and links are uniform across the whole lane block, and
            # [NN,3] arrays in VMEM would pad each 3-wide row to a
            # 128-lane tile (~42x VMEM blow-up — OOM at ~1M tris).
            first = meta_ref[node * 3]
            count = meta_ref[node * 3 + 1]
            skip = meta_ref[node * 3 + 2]

            tcap = jnp.minimum(best_t, tmax)
            t0x = (nmin_ref[node * 3] - rox) * invx
            t1x = (nmax_ref[node * 3] - rox) * invx
            t0y = (nmin_ref[node * 3 + 1] - roy) * invy
            t1y = (nmax_ref[node * 3 + 1] - roy) * invy
            t0z = (nmin_ref[node * 3 + 2] - roz) * invz
            t1z = (nmax_ref[node * 3 + 2] - roz) * invz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hit = (tf >= tn) & (tf >= tmin) & (tn <= tcap)
            if any_hit:
                hit = hit & (state[1] < 0)
            anyhit = jnp.any(hit)

            is_leaf = count > 0

            def sweep(st):
                dma = pltpu.make_async_copy(
                    pack_hbm.at[pl.ds(first * 16, 16), :],
                    tile_ref, sem_ref)
                dma.start()
                dma.wait()
                return _sweep_cluster(tile_ref[...], rays, tmin, tcap,
                                      excl, st)

            state = jax.lax.cond(is_leaf & anyhit, sweep, lambda s: s,
                                 state)
            nxt = jnp.where(anyhit & ~is_leaf, first, skip)
            return nxt, state

        _, state = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), state0))
        best_t, best_i, best_b, best_c = state
        found = best_i >= 0
        t_ref[...] = jnp.where(found, best_t, _BIG)[0]
        idx_ref[...] = best_i[0]
        bb_ref[...] = best_b[0]
        bc_ref[...] = best_c[0]

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "block", "interpret"))
def _run(nmin, nmax, meta, pack, rox, roy, roz, rdx, rdy, rdz,
         t_min, t_max, exclude, any_hit, block, interpret):
    R = rox.shape[0]
    grid = (R // block,)
    lane_spec = pl.BlockSpec((block,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    # Cluster-tree nodes live in SMEM: the kernel reads them as
    # scalars (one node per tree step, uniform over the block).
    # Arrays are FLATTENED to 1-D first — SMEM is untiled scalar
    # memory, but a 2-D [NN,3] shape still gets the (8,128) tiled
    # layout, padding each 3-wide row to 512 B (~42x, OOM at 1M tris).
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((R,), jnp.float32),
        jax.ShapeDtypeStruct((R,), jnp.int32),
        jax.ShapeDtypeStruct((R,), jnp.float32),
        jax.ShapeDtypeStruct((R,), jnp.float32),
    )
    return pl.pallas_call(
        _make_kernel(any_hit),
        grid=grid,
        in_specs=[smem, smem, smem,
                  pl.BlockSpec(memory_space=pl.ANY)]  # pack in HBM
        + [lane_spec] * 9,
        out_specs=(lane_spec, lane_spec, lane_spec, lane_spec),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((16, CLUSTER_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(nmin.reshape(-1), nmax.reshape(-1), meta.reshape(-1), pack,
      rox, roy, roz, rdx, rdy, rdz, t_min, t_max, exclude)


def intersect_clusters(scene, ro, rd, t_min, t_max, exclude=None,
                       any_hit: bool = False, block: int = DEFAULT_BLOCK,
                       interpret: bool = False) -> Hit:
    """Drop-in intersector backed by the cluster kernel.

    Requires `scene.clusters` (scene/clusters.build_clusters)."""
    cl = scene.clusters
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
        # Padding lanes get an empty interval: every slab test fails.
        t_min = jnp.pad(t_min, (0, pad), constant_values=_BIG)
        t_max = jnp.pad(t_max, (0, pad), constant_values=-_BIG)
        exclude = zf(exclude)

    t, idx, bb, bc = _run(cl.node_min, cl.node_max, cl.node_meta,
                          cl.pack, rox, roy, roz, rdx, rdy, rdz,
                          t_min, t_max, exclude, any_hit, block,
                          interpret)
    if pad:
        t, idx, bb, bc = t[:R], idx[:R], bb[:R], bc[:R]
    return Hit(t=t, tri=idx, bary_b=bb, bary_c=bc)
