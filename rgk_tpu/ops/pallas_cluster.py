"""Pallas TPU kernel: cluster-BVH ray intersection for large scenes.

The re-design of the reference's per-ray kd-tree traversal (reference
src/scene_intersect.cpp FindIntersectKd*) for a vector machine.  A
per-lane tree walk needs per-lane gathers the TPU lacks; instead each
*ray block* walks the small cluster tree once with a scalar cursor:

  while node < n_nodes:
      hit[lane] = slab(node AABB, lane interval)    # [S,128] VPU test
      if leaf and any(hit):  DMA the cluster's 128 Badouel rows
                             HBM -> VMEM, dense [128, 128] sweeps,
                             merge per-lane closest hit
      node = any(hit) ? hit_link : miss_link

Shared traversal trades some wasted sweeps on divergent blocks for
zero gathers and a fully dense inner loop; per-lane best_t keeps
pruning sound.  Design notes that set the performance shape:

* Ray blocks are laid out [S, 128] (sublanes x lanes), NOT [1, BLK]:
  a [1, 1024] f32 op occupies 8 vregs at 1/8 sublane occupancy, so the
  per-node slab test ran at 1/8 VPU density in the v1 kernel.
* Traversal is FRONT-TO-BACK per ray-direction octant: the scene
  commit precomputes eight link tables (scene/clusters.py
  build_octant_links) over the same canonical node ids, and each block
  DMAs its majority octant's table HBM -> SMEM once.  Near clusters
  sweep first, best_t drops early, and the slab test's
  `tn <= min(best_t, tmax)` prunes the far subtrees the v1 kernel
  swept (the reference's near-child-first ordering,
  src/scene_intersect.cpp:300-321, recovered TPU-style).
* The cluster tree's boxes/counts live in SMEM as scalars (uniform
  across the block); the triangle pack stays in HBM and streams per
  visited leaf as one lane-aligned [16, 128] coefficient-major tile.
* Shadow rays (any_hit) use a reduced sweep with no winner
  extraction and exit the walk as soon as every lane is occluded.

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
# Measured on the 1M-tri colonnade (tools/prof_block_sweep.py): 256
# balances leaf-sweep union redundancy (shrinks with block size)
# against per-block fixed cost; 128 ties, 1024 loses ~20%.
DEFAULT_BLOCK = 256
CLUSTER_SIZE = 128  # must match scene/clusters.CLUSTER_SIZE
_LANES = 128


def _sweep_slice(tilt, rays, tmin, tcap, excl, state):
    """Dense Badouel sweep of one cluster against one [1,128] ray
    slice, merged into that slice's running best state.

    tilt: [128, 16] triangle-major coefficients; rays: 6 x [1, 128];
    tmin/tcap/excl: [1, 128]; state: 4 x [1, 128] (t, id, beta, gamma).
    """
    rox, roy, roz, rdx, rdy, rdz = rays
    best_t, best_i, best_b, best_c = state

    def coef(j):
        return tilt[:, j:j + 1]  # [128, 1]

    nx, ny, nz, d = coef(0), coef(1), coef(2), coef(3)
    rddn = rdx * nx + rdy * ny + rdz * nz          # [128, 128]
    rodn = rox * nx + roy * ny + roz * nz + d
    safe = jnp.abs(rddn) > _PARALLEL_EPS
    t = -rodn / jnp.where(safe, rddn, 1.0)

    # Shared hit point: p = ro + t*rd once, then one dot per
    # barycentric (the GEMM oracle's formulation, intersect._pack_test)
    # — 6 fewer [128,128] planes than the expanded two-dot form.
    px = rox + t * rdx
    py = roy + t * rdy
    pz = roz + t * rdz
    b0, bvx, bvy, bvz = coef(4), coef(5), coef(6), coef(7)
    beta = b0 + px * bvx + py * bvy + pz * bvz
    g0, gvx, gvy, gvz = coef(8), coef(9), coef(10), coef(11)
    gamma = g0 + px * gvx + py * gvy + pz * gvz

    glass = coef(12) > 0.5
    pid = pltpu.bitcast(tilt[:, 13:14], jnp.int32)  # [128, 1]
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > tmin) & (t < tcap) & ~glass & (pid != excl))

    t_sel = jnp.where(ok, t, _BIG)
    tile_t = jnp.min(t_sel, axis=0, keepdims=True)       # [1, 128]
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


def _sweep_slice_any(tilt, rays, tmin, tcap, excl, best_t):
    """Any-hit sweep of one cluster against one [1,128] ray slice: a
    witness min-t only, no winner extraction (the reference's
    FindIntersectKdAny semantics, src/scene_intersect.cpp:118-208)."""
    rox, roy, roz, rdx, rdy, rdz = rays

    def coef(j):
        return tilt[:, j:j + 1]

    nx, ny, nz, d = coef(0), coef(1), coef(2), coef(3)
    rddn = rdx * nx + rdy * ny + rdz * nz
    rodn = rox * nx + roy * ny + roz * nz + d
    safe = jnp.abs(rddn) > _PARALLEL_EPS
    t = -rodn / jnp.where(safe, rddn, 1.0)

    px = rox + t * rdx
    py = roy + t * rdy
    pz = roz + t * rdz
    b0, bvx, bvy, bvz = coef(4), coef(5), coef(6), coef(7)
    beta = b0 + px * bvx + py * bvy + pz * bvz
    g0, gvx, gvy, gvz = coef(8), coef(9), coef(10), coef(11)
    gamma = g0 + px * gvx + py * gvy + pz * gvz

    glass = coef(12) > 0.5
    pid = pltpu.bitcast(tilt[:, 13:14], jnp.int32)
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > tmin) & (t < tcap) & ~glass & (pid != excl))
    return jnp.minimum(best_t,
                       jnp.min(jnp.where(ok, t, _BIG), axis=0,
                               keepdims=True))


def _make_kernel(any_hit: bool, stats: bool, n_sub: int):
    def kernel(nmin_hbm, nmax_hbm, count_hbm, oct_ref, links_hbm,
               pack_hbm,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               tmin_ref, tmax_ref, excl_ref,
               t_ref, idx_ref, bb_ref, bc_ref,
               *rest):
        if stats:
            nodes_ref, leaves_ref = rest[0], rest[1]
            rest = rest[2:]
        (tile_ref, sem_ref, nmin_ref, nmax_ref, count_ref, links_ref,
         tab_sem, st_t_ref, st_i_ref, st_b_ref, st_c_ref,
         occ_ref) = rest
        n_nodes = count_ref.shape[0]

        # The cluster-tree tables (~750 KB at 1M tris) live in HBM and
        # are DMA'd into PERSISTENT SMEM scratch once, on grid step 0.
        # Passing them as SMEM inputs instead re-copies them on EVERY
        # grid step — a measured ~36 us/block tax that dominated small
        # ray blocks (70% of block time at block=128) and capped the
        # work-efficiency win of narrow blocks.
        @pl.when(pl.program_id(0) == 0)
        def _load_tables():
            for i, (src, dst) in enumerate((
                    (nmin_hbm, nmin_ref), (nmax_hbm, nmax_ref),
                    (count_hbm, count_ref), (links_hbm, links_ref))):
                pltpu.make_async_copy(src, dst, tab_sem.at[i]).start()
            for i, (src, dst) in enumerate((
                    (nmin_hbm, nmin_ref), (nmax_hbm, nmax_ref),
                    (count_hbm, count_ref), (links_hbm, links_ref))):
                pltpu.make_async_copy(src, dst, tab_sem.at[i]).wait()

        # ---- v5 design: ONE shared cursor per block walks the tree
        # with full-width [S,128] slab tests (each vector->scalar
        # `any` sync costs ~250 cycles and Mosaic cannot overlap them,
        # so the sync must be amortized over the whole block), but
        # leaf sweeps are GATED PER 128-LANE SLICE: the leaf's slab
        # test is reduced to an S-bit mask in the same single sync
        # (sum of per-sublane any x 2^s), and only slices with a
        # hitting lane pay the [128,128] Badouel sweep.  This combines
        # the wide block's cheap traversal with the narrow block's
        # sweep work-efficiency (measured 4x fewer tri-tests/ray,
        # tools/prof_block_sweep.py).
        link_base = oct_ref[pl.program_id(0)] * n_nodes

        def grid2(ref):
            return ref[0]                 # [S, 128]

        rox2, roy2, roz2 = grid2(rox_ref), grid2(roy_ref), grid2(roz_ref)
        rdx2, rdy2, rdz2 = grid2(rdx_ref), grid2(rdy_ref), grid2(rdz_ref)
        tmin2 = grid2(tmin_ref)
        tmax2 = grid2(tmax_ref)
        excl2 = grid2(excl_ref)

        def inv(c):
            tiny = jnp.where(c >= 0.0, 1e-20, -1e-20)
            return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, tiny)

        invx, invy, invz = inv(rdx2), inv(rdy2), inv(rdz2)

        def sl(a, j):
            return a[j:j + 1, :]          # slice j's [1, 128] row

        bun = []
        for j in range(n_sub):
            bun.append(dict(
                rays=(sl(rox2, j), sl(roy2, j), sl(roz2, j),
                      sl(rdx2, j), sl(rdy2, j), sl(rdz2, j)),
                tmin=sl(tmin2, j), tmax=sl(tmax2, j),
                excl=sl(excl2, j),
            ))

        # Powers of two per sublane, for the packed per-slice mask.
        pow2_col = (jnp.int32(1) << jax.lax.broadcasted_iota(
            jnp.int32, (n_sub, 1), 0))

        # Hit state lives in mutable VMEM scratch, NOT in the
        # while-loop carry: loop-carried vectors force phi copies
        # through every node step.  With scratch state the loop
        # carries only scalars and leaf handling is a pure
        # side-effect `pl.when`.
        st_t_ref[...] = jnp.full((n_sub, _LANES), _BIG, jnp.float32)
        st_i_ref[...] = jnp.full((n_sub, _LANES), -1, jnp.int32)
        st_b_ref[...] = jnp.zeros((n_sub, _LANES), jnp.float32)
        st_c_ref[...] = jnp.zeros((n_sub, _LANES), jnp.float32)
        for j in range(n_sub):
            occ_ref[j] = 1  # any_hit: 1 = unoccluded lanes remain

        def dma_for(cid, slot):
            return pltpu.make_async_copy(
                pack_hbm.at[pl.ds(cid * 16, 16), :],
                tile_ref.at[slot], sem_ref.at[slot])

        def sweep_tile(j, tilt):
            """Sweep a transposed tile against slice j, merging into
            scratch."""
            b = bun[j]
            row = slice(j, j + 1)
            bt = st_t_ref[row, :]
            bi = st_i_ref[row, :]
            tc = jnp.minimum(bt, b["tmax"])
            if any_hit:
                ts = _sweep_slice_any(tilt, b["rays"], b["tmin"], tc,
                                      b["excl"], bt)
                ni = jnp.where(ts < _BIG, 0, bi)
                st_t_ref[row, :] = ts
                st_i_ref[row, :] = ni
                # Termination flag: 0 once every lane is occluded.
                occ_ref[j] = jnp.any(ni < 0).astype(jnp.int32)
            else:
                ts, is_, bs, cs = _sweep_slice(
                    tilt, b["rays"], b["tmin"], tc, b["excl"],
                    (bt, bi, st_b_ref[row, :], st_c_ref[row, :]))
                st_t_ref[row, :] = ts
                st_i_ref[row, :] = is_
                st_b_ref[row, :] = bs
                st_c_ref[row, :] = cs

        def slab_bits(n, tcap, occ):
            """Full-width slab test of node n -> packed per-slice hit
            mask (bit j = some lane of slice j hits), ONE sync."""
            t0x = (nmin_ref[n * 3] - rox2) * invx
            t1x = (nmax_ref[n * 3] - rox2) * invx
            t0y = (nmin_ref[n * 3 + 1] - roy2) * invy
            t1y = (nmax_ref[n * 3 + 1] - roy2) * invy
            t0z = (nmin_ref[n * 3 + 2] - roz2) * invz
            t1z = (nmax_ref[n * 3 + 2] - roz2) * invz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hit = (tf >= tn) & (tf >= tmin2) & (tn <= tcap)
            if any_hit:
                hit = hit & ~occ
            any_s = jnp.any(hit, axis=1, keepdims=True)  # [S,1]
            return jnp.sum(jnp.where(any_s, pow2_col, 0))

        def cond(carry):
            node = carry[0]
            alive = node < n_nodes
            if any_hit:
                work = occ_ref[0]
                for j in range(1, n_sub):
                    work = work + occ_ref[j]
                alive = alive & (work > 0)
            return alive

        def body(carry):
            """One outer step = march the shared cursor to the NEXT
            leaf any lane hits (inner loop, scalar carry only), then
            handle the leaf: sweep the PENDING leaf's hitting slices,
            start this leaf's DMA."""
            node, pend, pbits, slot, steps_v, leaves_v = carry
            tcap = jnp.minimum(st_t_ref[...], tmax2)
            occ = (st_i_ref[...] >= 0) if any_hit else None

            def inner_cond(c):
                n, stop = c[0], c[1]
                return (n < n_nodes) & ~stop

            def inner_body(c):
                n, _, _, steps = c
                count = count_ref[n]
                link = links_ref[link_base + n]
                bits = slab_bits(n, tcap, occ)
                anyh = bits != 0
                is_leaf = count > 0
                stop = anyh & is_leaf
                nxt = jnp.where(anyh & ~is_leaf, link >> 16,
                                link & 0xFFFF)
                return (jnp.where(stop, n, nxt), stop, bits, steps + 1)

            leaf_node, stop, bits, steps = jax.lax.while_loop(
                inner_cond, inner_body,
                (node, jnp.bool_(False), jnp.int32(0), jnp.int32(0)))
            llink = links_ref[link_base
                              + jnp.minimum(leaf_node, n_nodes - 1)]
            new_slot = jnp.where(stop & (pend >= 0), 1 - slot, slot)

            # Double-buffered leaf streaming: the found leaf's DMA
            # starts NOW, its sweep is deferred until the next leaf
            # (or walk end) so the fetch rides under the node marches.
            # The one-leaf lag only loosens tcap (best_t still only
            # shrinks), so pruning stays sound.
            @pl.when(stop)
            def _handle_leaf():
                # ONE semaphore wait for the pending tile (waits are
                # consume-once), then per-slice gated sweeps.
                @pl.when(pbits != 0)
                def _wait_pending():
                    dma_for(pend, slot).wait()
                # ONE [16,128] transpose per LEAF, shared by all its
                # gated slice sweeps (a per-sweep transpose was ~13%
                # of kernel time).
                tilt = tile_ref[slot].T
                for j in range(n_sub):
                    @pl.when((pbits >> j) % 2 == 1)
                    def _sweep_pending(j=j):
                        sweep_tile(j, tilt)
                dma_for(llink >> 16, new_slot).start()

            return (jnp.where(stop, llink & 0xFFFF, leaf_node),
                    jnp.where(stop, llink >> 16, pend),
                    jnp.where(stop, bits, pbits),
                    new_slot,
                    steps_v + steps,
                    leaves_v + stop.astype(jnp.int32))

        init = (jnp.int32(0), jnp.int32(-1), jnp.int32(0),
                jnp.int32(0), jnp.int32(0), jnp.int32(0))
        _, pend, pbits, slot, n_nodes_v, n_leaves_v = \
            jax.lax.while_loop(cond, body, init)

        # Flush the pending leaf's hitting slices.
        @pl.when(pbits != 0)
        def _wait_final():
            dma_for(pend, slot).wait()
        tilt_f = tile_ref[slot].T
        for j in range(n_sub):
            @pl.when((pbits >> j) % 2 == 1)
            def _flush(j=j):
                sweep_tile(j, tilt_f)

        best_t = st_t_ref[...]
        best_i = st_i_ref[...]
        best_b = st_b_ref[...]
        best_c = st_c_ref[...]
        found = best_i >= 0
        t_ref[0] = jnp.where(found, best_t, _BIG)
        idx_ref[0] = best_i
        bb_ref[0] = best_b
        bc_ref[0] = best_c
        if stats:
            nodes_ref[0] = jnp.full((n_sub, _LANES), n_nodes_v,
                                    jnp.int32)
            leaves_ref[0] = jnp.full((n_sub, _LANES), n_leaves_v,
                                     jnp.int32)

    return kernel


@partial(jax.jit,
         static_argnames=("any_hit", "block", "interpret", "stats"))
def _run(nmin, nmax, meta, links, pack, rox, roy, roz, rdx, rdy, rdz,
         t_min, t_max, exclude, any_hit, block, interpret, stats=False):
    R = rox.shape[0]
    n_sub = block // _LANES
    grid = (R // block,)

    # Majority ray-direction octant per block selects the
    # front-to-back link table (bit a set = negative along axis a).
    o = ((rdx < 0).astype(jnp.int32) + 2 * (rdy < 0).astype(jnp.int32)
         + 4 * (rdz < 0).astype(jnp.int32)).reshape(grid[0], block)
    hist = jnp.sum(o[:, :, None] == jnp.arange(8)[None, None, :],
                   axis=1)
    oct = jnp.argmax(hist, axis=1).astype(jnp.int32)

    def shape3(a):
        return a.reshape(grid[0], n_sub, _LANES)

    lane_spec = pl.BlockSpec((1, n_sub, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # Cluster-tree boxes/counts/links are HBM inputs; the kernel DMAs
    # them into persistent SMEM *scratch* on grid step 0 (see
    # _make_kernel) and reads them as scalars (one node per tree step,
    # uniform over the block).  Arrays are FLATTENED to 1-D — SMEM is
    # untiled scalar memory, but a 2-D [NN,3] shape still gets the
    # (8,128) tiled layout, padding each 3-wide row to 512 B (~42x,
    # OOM at 1M tris).  SMEM budget at 1M tris (N=15593): boxes 374 KB
    # + counts 62 KB + packed links 8N*4 = 499 KB ≈ 940 KB.
    smem = pl.BlockSpec(memory_space=pl.ANY)
    n_nodes = int(meta.shape[0])
    out_shape = [
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.float32),
    ]
    out_specs = [lane_spec] * 4
    if stats:
        # Per-block traversal counters (visited nodes, swept leaves),
        # broadcast across the block's lanes.
        out_shape += [jax.ShapeDtypeStruct(
            (grid[0], n_sub, _LANES), jnp.int32)] * 2
        out_specs += [lane_spec] * 2
    outs = pl.pallas_call(
        _make_kernel(any_hit, stats, n_sub),
        grid=grid,
        in_specs=[smem, smem, smem,
                  # per-block majority octants: small [n_blocks] i32,
                  # whole-array SMEM (rank-1 SMEM blocks must be whole
                  # or 128-multiples on Mosaic)
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  smem,
                  pl.BlockSpec(memory_space=pl.ANY)]   # pack in HBM
        + [lane_spec] * 9,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CLUSTER_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((n_nodes * 3,), jnp.float32),   # node_min
            pltpu.SMEM((n_nodes * 3,), jnp.float32),   # node_max
            pltpu.SMEM((n_nodes,), jnp.int32),         # counts
            pltpu.SMEM((8 * n_nodes,), jnp.int32),     # octant links
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((n_sub, _LANES), jnp.float32),  # best t
            pltpu.VMEM((n_sub, _LANES), jnp.int32),    # best tri
            pltpu.VMEM((n_sub, _LANES), jnp.float32),  # best beta
            pltpu.VMEM((n_sub, _LANES), jnp.float32),  # best gamma
            pltpu.SMEM((n_sub,), jnp.int32),           # any_hit flags
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),  # sequential grid:
        # step 0 loads the SMEM tables every later step reads
        interpret=interpret,
    )(nmin.reshape(-1), nmax.reshape(-1),
      meta[:, 1] + 0, oct, links.reshape(-1),
      pack, shape3(rox), shape3(roy), shape3(roz), shape3(rdx),
      shape3(rdy), shape3(rdz), shape3(t_min), shape3(t_max),
      shape3(exclude))
    return tuple(x.reshape(R, *x.shape[3:]) if x.ndim == 3
                 else x.reshape(R) for x in outs)


def _spread3(x):
    """Spread 8 bits so consecutive bits land 3 apart (morton)."""
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton3(q):
    """[R,3] int coords (<=8 bits each) -> interleaved morton code."""
    return (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
            | (_spread3(q[:, 2]) << 2))


def _ray_sort_key(cl, ro, rd):
    """Coherence key: direction octant (top 3 bits), then a 5-bit/axis
    morton code of the origin inside the scene box, then a 4-bit/axis
    morton code of the direction.  Rays sharing a block then share a
    front-to-back order and a small cluster working set — the
    wavefront analogue of the reference's center-out tile ordering
    (src/render_driver.cpp:30-46).

    The direction bits matter mainly for camera-ray bundles, where
    the origin morton is constant and only direction separates a
    tight cone from a whole hemisphere fan.  (Shadow rays trace from
    the shade point toward the light — ops/intersect.py visibility —
    so their origin morton varies per lane and the octant/origin bits
    dominate.)
    """
    lo = cl.node_min[0]
    inv = 31.0 / jnp.maximum(cl.node_max[0] - lo, 1e-9)
    qo = jnp.clip((ro - lo) * inv, 0.0, 31.0).astype(jnp.int32)
    qd = jnp.clip((rd + 1.0) * 7.5, 0.0, 15.0).astype(jnp.int32)
    octant = ((rd[:, 0] < 0).astype(jnp.int32)
              + 2 * (rd[:, 1] < 0).astype(jnp.int32)
              + 4 * (rd[:, 2] < 0).astype(jnp.int32))
    return (octant << 27) | (_morton3(qo) << 12) | _morton3(qd)


def intersect_clusters(scene, ro, rd, t_min, t_max, exclude=None,
                       any_hit: bool = False, block: int = DEFAULT_BLOCK,
                       interpret: bool = False,
                       sort_rays: bool = True) -> Hit:
    """Drop-in intersector backed by the cluster kernel.

    Requires `scene.clusters` (scene/clusters.build_clusters)."""
    cl = scene.clusters
    R = ro.shape[0]
    assert block % _LANES == 0, "block must be a multiple of 128 lanes"
    Rp = -(-R // block) * block
    pad = Rp - R

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if exclude is None:
        exclude = jnp.full((R,), -1, jnp.int32)

    # Sort lanes by coherence key so blocks see small cluster unions;
    # per-lane results are order-independent, so this only affects
    # speed.  XLA's TPU sort/gather make this ~0.4 ms per 1M rays.
    # Lanes with an empty interval (masked-off visibility rays, dead
    # wavefront lanes) sort to the end, packing into blocks that fail
    # the root slab immediately and cost nothing.
    inv_perm = None
    if sort_rays and R > block:
        key = jnp.where(t_max <= t_min, jnp.int32(0x7FFFFFFF),
                        _ray_sort_key(cl, ro, rd))
        perm = jnp.argsort(key)
        inv_perm = jnp.argsort(perm)
        ro, rd = ro[perm], rd[perm]
        t_min, t_max, exclude = t_min[perm], t_max[perm], exclude[perm]

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
                          cl.octant_links, cl.pack,
                          rox, roy, roz, rdx, rdy, rdz,
                          t_min, t_max, exclude, any_hit, block,
                          interpret)
    if pad:
        t, idx, bb, bc = t[:R], idx[:R], bb[:R], bc[:R]
    if inv_perm is not None:
        t, idx, bb, bc = (t[inv_perm], idx[inv_perm], bb[inv_perm],
                          bc[inv_perm])
    return Hit(t=t, tri=idx, bary_b=bb, bary_c=bc)
