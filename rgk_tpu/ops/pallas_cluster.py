"""Pallas TPU kernel: cluster-BVH ray intersection for large scenes.

The re-design of the reference's per-ray kd-tree traversal (reference
src/scene_intersect.cpp FindIntersectKd*) for a vector machine.  A
per-lane tree walk needs per-lane gathers the TPU lacks; instead each
*ray block* walks the small chunk tree once with a scalar cursor:

  while node < n_nodes:
      hit[lane] = slab(node AABB, lane interval)    # [S,128] VPU test
      if leaf and any(hit):  DMA the chunk's Badouel rows HBM -> VMEM,
                             dense [rows, 128] sweeps, merge per-lane
                             closest hit
      node = any(hit) ? hit_link : miss_link

Shared traversal trades some wasted sweeps on divergent blocks for
zero gathers and a fully dense inner loop; per-lane best_t keeps
pruning sound.  Design notes that set the performance shape (v5
measurements in tools/prof_block_sweep.py still apply):

* Ray blocks are laid out [S, 128] (sublanes x lanes): full-width
  slab tests amortize the ~250-cycle vector->scalar sync over the
  whole block, while leaf sweeps are GATED PER 128-LANE SLICE by a
  packed bit mask computed in that same single sync.
* Traversal is FRONT-TO-BACK per ray-direction octant
  (scene/clusters.build_octant_links); v6 pages ONE octant's link
  table HBM -> SMEM per ray block (skipped while consecutive sorted
  blocks share the octant) instead of keeping all eight resident.
* v6 node tables are SMEM-compact (u16 fixed-point boxes at 12 B per
  node, 1-bit leaf flags): the tree scales to CHUNK_CAP leaves
  regardless of scene size, removing the round-4 2.1M-triangle
  ceiling, and the finest chunk is 64 triangles — HALF a DMA tile —
  so divergent blocks sweep half-tiles instead of whole clusters.
  Sibling halves share one DMA via the pending-tile dedup.
* v6 sweeps drop the `safe` parallel-ray plane (IEEE inf/NaN already
  fail the interval compares), drop the glass mask (thin-glass and
  padding fold into never-hit coefficients at build), and extract
  only (t, triangle id) with two sublane reductions — barycentrics
  are recomputed OUTSIDE the kernel from the winner's original
  tri_pack row, which removes two more [rows,128] reductions from
  the hot loop (each ~21 vreg-instructions).
* Shadow rays (any_hit) use a reduced sweep with no winner
  extraction and exit the walk as soon as every lane is occluded.

Rays ride the lane axis exactly like the flat kernel
(ops/pallas_intersect.py); triangles ride sublanes in the sweep.
See scene/clusters.py for the host-side structure and tile layout
(row 13 = original triangle id bitcast to float).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

_BIG = 3.4e38
# Measured on the 1M-tri colonnade (tools/prof_block_sweep.py + e2e
# bench): with the v7 frontier march + v8 ring pipeline the per-block
# fixed costs amortize better at 512 (e2e 0.85 -> 0.91 Mrays/s vs
# 256); 1024 wins coherent microbenches but loses the e2e mix to
# sweep-union redundancy.
DEFAULT_BLOCK = 512
_LANES = 128


def _sweep_rows(tilt, rays, tmin, tcap, excl, state, any_hit):
    """Dense Badouel sweep of `tilt` [rows, 16] triangle-major
    coefficients against one [1,128] ray slice, merged into that
    slice's running best state (t, id).

    rays: 6 x [1, 128]; tmin/tcap/excl: [1, 128]; state: (t, id).
    Pure VPU hit-point form — an MXU variant ([rows,16] @ [16,6*128]
    two-dot contraction) measured 20-25% SLOWER across every regime
    (the 12-deep contraction wastes the systolic array and the ray
    matrices spill), so the dots stay elementwise.  No `safe` plane:
    a parallel ray gives rddn == 0, t = +-inf or NaN, and every
    interval compare is false (thin-glass/padding rows are folded to
    d=1, n=0 at build => t = -inf, same rejection)."""
    rox, roy, roz, rdx, rdy, rdz = rays
    best_t, best_i = state

    def coef(j):
        return tilt[:, j:j + 1]  # [rows, 1]

    nx, ny, nz, d = coef(0), coef(1), coef(2), coef(3)
    rddn = rdx * nx + rdy * ny + rdz * nz          # [rows, 128]
    rodn = rox * nx + roy * ny + roz * nz + d
    t = -rodn / rddn

    # Shared hit point: p = ro + t*rd once, then one dot per
    # barycentric (the GEMM oracle's formulation, intersect._pack_test)
    # — bitwise-identical to the outside recompute in
    # intersect_clusters.
    px = rox + t * rdx
    py = roy + t * rdy
    pz = roz + t * rdz
    b0, bvx, bvy, bvz = coef(4), coef(5), coef(6), coef(7)
    beta = b0 + px * bvx + py * bvy + pz * bvz
    g0, gvx, gvy, gvz = coef(8), coef(9), coef(10), coef(11)
    gamma = g0 + px * gvx + py * gvy + pz * gvz

    pid = pltpu.bitcast(tilt[:, 13:14], jnp.int32)  # [rows, 1]
    ok = ((beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > tmin) & (t < tcap) & (pid != excl))

    t_sel = jnp.where(ok, t, _BIG)
    tile_t = jnp.min(t_sel, axis=0, keepdims=True)       # [1, 128]
    if any_hit:
        # Witness only (reference FindIntersectKdAny semantics,
        # src/scene_intersect.cpp:118-208): no winner extraction.
        ts = jnp.minimum(best_t, tile_t)
        return ts, jnp.where(ts < _BIG, 0, best_i)
    onehot = t_sel == tile_t
    pid_b = jnp.broadcast_to(pid, t.shape)
    tile_i = jnp.min(jnp.where(onehot, pid_b, jnp.int32(0x7FFFFFFF)),
                     axis=0, keepdims=True)
    win = tile_t < best_t
    return (jnp.where(win, tile_t, best_t),
            jnp.where(win, tile_i, best_i))


def _make_kernel(any_hit: bool, stats: bool, n_sub: int, n_nodes: int,
                 tpc: int, half_leaf: bool, K: int):
    """tpc: DMA tiles per chunk; half_leaf: chunks are 64-tri HALVES
    of a shared DMA tile (chunk_halves == 1); K: nodes slab-tested
    per vector->scalar sync (the frontier batch width)."""

    rows_dma = 16 * tpc
    RING = 16  # chunk-stream pipeline depth (VMEM slots)

    def kernel(boxes_hbm, bits_hbm, links_hbm, oct_ref, lo_ref,
               step_ref, pack_hbm,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               tmin_ref, tmax_ref, excl_ref,
               t_ref, idx_ref,
               *rest):
        if stats:
            nodes_ref, leaves_ref = rest[0], rest[1]
            rest = rest[2:]
        (tile_ref, sem_ref, boxes_ref, bits_ref, links_ref,
         tab_sem, prev_ref, st_t_ref, st_i_ref, occ_ref,
         stack_ref, lq_n_ref, lq_b_ref, ring_t_ref, ring_b_ref) = rest

        # The shared node tables (boxes + leaf bits) are DMA'd into
        # PERSISTENT SMEM scratch once, on grid step 0.  (Passing them
        # as SMEM inputs instead re-copies them on EVERY grid step — a
        # measured ~36 us/block tax in v4.)
        @pl.when(pl.program_id(0) == 0)
        def _load_tables():
            c0 = pltpu.make_async_copy(boxes_hbm, boxes_ref,
                                       tab_sem.at[0])
            c1 = pltpu.make_async_copy(bits_hbm, bits_ref,
                                       tab_sem.at[1])
            c0.start()
            c1.start()
            c0.wait()
            c1.wait()
            prev_ref[0] = -1

        # Per-octant link paging: one octant's table is SMEM-resident
        # at a time; the coherence sort gives long same-octant runs of
        # blocks, so the ~Nsub*512B copy amortizes to ~8 per pass.
        oct = oct_ref[pl.program_id(0)]
        ns_links = links_ref.shape[0]

        @pl.when(oct != prev_ref[0])
        def _page_links():
            cp = pltpu.make_async_copy(
                links_hbm.at[pl.ds(oct * ns_links, ns_links), :],
                links_ref, tab_sem.at[2])
            cp.start()
            cp.wait()
            prev_ref[0] = oct

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

        # Quantized-frame slab terms: box planes are u16 grid coords
        # q, world t = (q*step + lo - ro) * inv = (q - ro') * inv'
        # with ro' = (ro - lo)/step and inv' = step * inv, both
        # precomputed per block.  t values stay in WORLD units.
        lox, loy, loz = lo_ref[0], lo_ref[1], lo_ref[2]
        stx, sty, stz = step_ref[0], step_ref[1], step_ref[2]
        rqx = (rox2 - lox) / stx
        rqy = (roy2 - loy) / sty
        rqz = (roz2 - loz) / stz
        ivx = stx * inv(rdx2)
        ivy = sty * inv(rdy2)
        ivz = stz * inv(rdz2)

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

        # Hit state lives in mutable VMEM scratch, NOT in the
        # while-loop carry: loop-carried vectors force phi copies
        # through every node step.  With scratch state the loop
        # carries only scalars and leaf handling is a pure
        # side-effect `pl.when`.
        st_t_ref[...] = jnp.full((n_sub, _LANES), _BIG, jnp.float32)
        st_i_ref[...] = jnp.full((n_sub, _LANES), -1, jnp.int32)
        for j in range(n_sub):
            occ_ref[j] = 1  # any_hit: 1 = unoccluded lanes remain

        def dma_for(tile, slot):
            return pltpu.make_async_copy(
                pack_hbm.at[pl.ds(tile * rows_dma, rows_dma), :],
                tile_ref.at[slot], sem_ref.at[slot])

        def sweep_rows(j, tilt):
            b = bun[j]
            row = slice(j, j + 1)
            bt = st_t_ref[row, :]
            bi = st_i_ref[row, :]
            tc = jnp.minimum(bt, b["tmax"])
            ts, is_ = _sweep_rows(tilt, b["rays"], b["tmin"], tc,
                                  b["excl"], (bt, bi), any_hit)
            st_t_ref[row, :] = ts
            st_i_ref[row, :] = is_
            if any_hit:
                # Termination flag: 0 once every lane is occluded.
                occ_ref[j] = jnp.any(is_ < 0).astype(jnp.int32)

        def flush_sweep(pbits, slot):
            """Sweep the pending chunk's hitting (slice[, half])s.
            ONE [16,128]->[128,16] transpose per DMA tile, shared by
            all its gated sweeps."""
            if half_leaf:
                tilt = tile_ref[slot][...].T            # [128, 16]
                for hf in range(2):
                    rows = tilt[hf * 64:(hf + 1) * 64, :]
                    for j in range(n_sub):
                        @pl.when((pbits >> (hf * n_sub + j)) % 2 == 1)
                        def _sw(j=j, rows=rows):
                            sweep_rows(j, rows)
            else:
                loaded = tile_ref[slot][...]            # [16*tpc, 128]
                for ti in range(tpc):
                    tilt = loaded[ti * 16:(ti + 1) * 16, :].T
                    for j in range(n_sub):
                        @pl.when((pbits >> j) % 2 == 1)
                        def _sw(j=j, tilt=tilt):
                            sweep_rows(j, tilt)

        def unpack_hi(w):
            return ((w >> 16) & 0xFFFF).astype(jnp.float32)

        def unpack_lo(w):
            return (w & 0xFFFF).astype(jnp.float32)

        def slab_hits(n, tcap, occ):
            """Full-width slab test of node n -> [S, 128] hit mask
            (pure vector work, NO sync — the caller batches the
            reduction over K nodes)."""
            w0 = boxes_ref[3 * n]
            w1 = boxes_ref[3 * n + 1]
            w2 = boxes_ref[3 * n + 2]
            t0x = (unpack_hi(w0) - rqx) * ivx
            t1x = (unpack_lo(w1) - rqx) * ivx
            t0y = (unpack_lo(w0) - rqy) * ivy
            t1y = (unpack_hi(w2) - rqy) * ivy
            t0z = (unpack_hi(w1) - rqz) * ivz
            t1z = (unpack_lo(w2) - rqz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hit = (tf >= tn) & (tf >= tmin2) & (tn <= tcap)
            if any_hit:
                hit = hit & ~occ
            return hit

        def link_at(n):
            return links_ref[n >> 7, n & 127]

        def is_leaf(n):
            return ((bits_ref[n >> 5] >> (n & 31)) & 1) > 0

        # ---- v7 frontier march.  The v5/v6 single-cursor walk paid
        # one ~250-cycle vector->scalar sync PER NODE (the "any lane
        # hits" reduction) — measured as the dominant cost in every
        # divergent regime (tools/prof_block_sweep.py r5).  Instead a
        # scalar STACK drives a batched walk: each round pops up to K
        # nodes, slab-tests all of them as pure vector work, and packs
        # all K*S per-(node, slice) hit bits through ONE reduction.
        # Children are pushed far-then-near with the nearest popped
        # node's children pushed last, so pops stay approximately
        # front-to-back and best_t pruning keeps its bite.
        stack_ref[0] = 0  # root

        def cond(carry):
            top = carry[0]
            alive = top > 0
            if any_hit:
                work = occ_ref[0]
                for j in range(1, n_sub):
                    work = work + occ_ref[j]
                alive = alive & (work > 0)
            return alive

        def body(carry):
            top, head, tail, steps_v, leaves_v = carry
            tcap = jnp.minimum(st_t_ref[...], tmax2)
            occ = (st_i_ref[...] >= 0) if any_hit else None

            k_eff = jnp.minimum(jnp.int32(K), top)
            pow2_col = (jnp.int32(1) << jax.lax.broadcasted_iota(
                jnp.int32, (n_sub, 1), 0))
            ns = []
            tot = jnp.zeros((n_sub, 1), jnp.int32)
            for i in range(K):
                n = stack_ref[jnp.maximum(top - 1 - i, 0)]
                ns.append(n)
                hit = slab_hits(n, tcap, occ)          # [S, 128]
                anyc = jnp.any(hit, axis=1, keepdims=True)   # [S, 1]
                tot = tot + jnp.where(anyc & (i < k_eff),
                                      pow2_col << (i * n_sub), 0)
            # ONE sync for the whole batch: bit (i*S + s) = some lane
            # of slice s hits node i.
            bits_all = jnp.sum(tot)

            top2 = top - k_eff
            # Phase A1 (scalar): queue hit leaves near-first for the
            # single-emission sweep loop below.
            lcount = jnp.int32(0)
            decisions = []
            for i in range(K):
                b_i = (bits_all >> (i * n_sub)) & ((1 << n_sub) - 1)
                hit = (i < k_eff) & (b_i != 0)
                wlink = link_at(ns[i])
                near = (wlink >> 16) & 0xFFFF
                leaf = is_leaf(ns[i])
                decisions.append((hit, leaf, near, b_i))
                leaf_hit = hit & leaf
                # Unconditional stores: slot lcount only becomes live
                # when lcount advances past it, so a non-queue just
                # leaves garbage the next queue overwrites.  Predicated
                # stores here measured ~5x slower in the binned-kernel
                # experiments (pallas_binned.py) — branches serialize
                # the scalar pipeline.
                lq_n_ref[lcount] = near
                lq_b_ref[lcount] = b_i
                lcount = lcount + leaf_hit.astype(jnp.int32)

            # Phase A2 (scalar): push hit inner nodes' children
            # far-then-near, farthest popped node first, so the
            # nearest node's near child ends on top of the stack.
            for i in range(K - 1, -1, -1):
                hit, leaf, near, _ = decisions[i]
                push = hit & ~leaf
                # far child = the near child's skip successor
                # (miss(near(n)) == far(n) by construction).  Stores
                # are unconditional into free slots at/above top2 —
                # same rationale as the leaf queue above.
                stack_ref[top2] = link_at(near) & 0xFFFF
                stack_ref[top2 + 1] = near
                top2 = top2 + 2 * push.astype(jnp.int32)

            # Phase B: the queued leaves feed a RING-pipelined chunk
            # stream.  A 2-deep pipeline made each sweep wait its own
            # DMA when several leaves surfaced in one round (measured:
            # the dominant residual cost after the frontier batched
            # the syncs); instead every queued leaf's DMA starts
            # immediately, and sweeps drain only down to RING-K
            # in-flight — so fetches ride under the NEXT round's slab
            # work.  The sweep lag only loosens tcap (best_t still
            # only shrinks), so pruning stays sound.  Sibling 64-tri
            # halves share one DMA tile and are queued adjacently:
            # they merge into the last started entry instead of
            # re-fetching.

            # B1: make room, sweeping the oldest in-flight chunks.
            head = drain(head, tail, RING - K)

            # B2: start this round's DMAs (with sibling-tile merge).
            def start_body(j, tl):
                chunk = lq_n_ref[j]
                bts = lq_b_ref[j]
                if half_leaf:
                    tile = chunk >> 1
                    nb = bts << ((chunk & 1) * n_sub)
                    same = (tl > head) & \
                        (ring_t_ref[(tl - 1) % RING] == tile)
                else:
                    tile = chunk
                    nb = bts
                    same = jnp.bool_(False)

                @pl.when(same)
                def _merge(tl=tl, nb=nb):
                    s = (tl - 1) % RING
                    ring_b_ref[s] = ring_b_ref[s] | nb

                @pl.when(~same)
                def _start(tl=tl, tile=tile, nb=nb):
                    s = tl % RING
                    ring_t_ref[s] = tile
                    ring_b_ref[s] = nb
                    dma_for(tile, s).start()

                return tl + (~same).astype(jnp.int32)

            tail = jax.lax.fori_loop(0, lcount, start_body, tail)

            return (top2, head, tail,
                    steps_v + k_eff, leaves_v + lcount)

        def drain(head, tail, keep):
            """Wait + sweep in-flight ring entries until at most
            `keep` remain."""
            def dcond(h):
                return (tail - h) > keep

            def dbody(h):
                s = h % RING
                dma_for(ring_t_ref[s], s).wait()
                flush_sweep(ring_b_ref[s], s)
                return h + 1

            return jax.lax.while_loop(dcond, dbody, head)

        init = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.int32(0))
        _, head, tail, n_nodes_v, n_leaves_v = \
            jax.lax.while_loop(cond, body, init)

        # Drain every remaining in-flight chunk (the kernel must not
        # end with outstanding DMA semaphores; any_hit early exit
        # reaches here with up to RING entries pending).
        drain(head, tail, 0)

        t_ref[0] = st_t_ref[...]
        idx_ref[0] = st_i_ref[...]
        if stats:
            nodes_ref[0] = jnp.full((n_sub, _LANES), n_nodes_v,
                                    jnp.int32)
            leaves_ref[0] = jnp.full((n_sub, _LANES), n_leaves_v,
                                     jnp.int32)

    return kernel


@partial(jax.jit,
         static_argnames=("chunk_halves", "any_hit", "block",
                          "interpret", "stats"))
def _run(boxes_q, leaf_bits, links, pack, scene_lo, scene_step,
         rox, roy, roz, rdx, rdy, rdz, t_min, t_max, exclude,
         chunk_halves, any_hit, block, interpret, stats=False):
    R = rox.shape[0]
    n_sub = block // _LANES
    grid = (R // block,)
    n_nodes = int(boxes_q.shape[0]) // 3
    tpc = max(1, chunk_halves // 2)
    half_leaf = chunk_halves == 1
    # Frontier batch width: all K*S hit bits must fit one non-sign
    # int32.  8 is the measured knee: K=15 at S<=2 loses 15-20% on
    # coherent blocks, whose frontiers are usually narrower than K —
    # the masked tail still pays full vector slab work.
    K = max(1, min(8, 31 // n_sub))

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
    # Node tables are HBM inputs; the kernel DMAs boxes + leaf bits
    # into persistent SMEM *scratch* on grid step 0 and pages one
    # octant's links per block (see _make_kernel).  All 1-D tables
    # are FLAT — SMEM is untiled scalar memory, but a 2-D [NN,3]
    # shape still gets the (8,128) tiled layout, padding each 3-wide
    # row to 512 B.  SMEM budget at CHUNK_CAP=20000 leaves
    # (N=39999): boxes 12B*N = 480 KB + links page 4B*N = 160 KB +
    # leaf bits 5 KB = ~645 KB, inside the measured ~1 MB v5e
    # ceiling (tools/prof_smem_probe.py).
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    n_sub_links = links.shape[0] // 8
    out_shape = [
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.int32),
    ]
    out_specs = [lane_spec] * 2
    if stats:
        # Per-block traversal counters (visited nodes, swept leaves),
        # broadcast across the block's lanes.
        out_shape += [jax.ShapeDtypeStruct(
            (grid[0], n_sub, _LANES), jnp.int32)] * 2
        out_specs += [lane_spec] * 2
    outs = pl.pallas_call(
        _make_kernel(any_hit, stats, n_sub, n_nodes, tpc, half_leaf, K),
        grid=grid,
        in_specs=[hbm, hbm, hbm,
                  # per-block majority octants: small [n_blocks] i32,
                  # whole-array SMEM (rank-1 SMEM blocks must be whole
                  # or 128-multiples on Mosaic)
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  hbm]                                 # pack in HBM
        + [lane_spec] * 9,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((16, 16 * tpc, _LANES), jnp.float32),  # ring
            pltpu.SemaphoreType.DMA((16,)),
            pltpu.SMEM((n_nodes * 3,), jnp.int32),     # quantized boxes
            pltpu.SMEM((leaf_bits.shape[0],), jnp.int32),
            pltpu.SMEM((n_sub_links, _LANES), jnp.int32),  # octant page
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),               # resident octant
            pltpu.VMEM((n_sub, _LANES), jnp.float32),  # best t
            pltpu.VMEM((n_sub, _LANES), jnp.int32),    # best tri
            pltpu.SMEM((n_sub,), jnp.int32),           # any_hit flags
            # Frontier stack: strict bound is K*(tree depth)+K; 4096
            # covers CHUNK_CAP trees with a wide margin.
            pltpu.SMEM((4096,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),               # round leaf ids
            pltpu.SMEM((K,), jnp.int32),               # round leaf bits
            pltpu.SMEM((16,), jnp.int32),              # ring tiles
            pltpu.SMEM((16,), jnp.int32),              # ring bits
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),  # sequential grid:
        # step 0 loads the SMEM tables every later step reads, and
        # the octant page persists across same-octant runs
        interpret=interpret,
    )(boxes_q, leaf_bits, links, oct, scene_lo, scene_step,
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
    front-to-back order and a small chunk working set — the
    wavefront analogue of the reference's center-out tile ordering
    (src/render_driver.cpp:30-46).

    The direction bits matter mainly for camera-ray bundles, where
    the origin morton is constant and only direction separates a
    tight cone from a whole hemisphere fan.  (Shadow rays trace from
    the shade point toward the light — ops/intersect.py visibility —
    so their origin morton varies per lane and the octant/origin bits
    dominate.)
    """
    lo = cl.scene_lo
    extent = cl.scene_step * 65535.0
    inv = 31.0 / jnp.maximum(extent, 1e-9)
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

    Requires `scene.clusters` (scene/clusters.build_clusters) and
    t_min >= 0 (the reference's traversal contract as well —
    src/scene_intersect.cpp always enters with mint >= 0)."""
    cl = scene.clusters
    R = ro.shape[0]
    assert block % _LANES == 0, "block must be a multiple of 128 lanes"
    Rp = -(-R // block) * block
    pad = Rp - R

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if exclude is None:
        exclude = jnp.full((R,), -1, jnp.int32)

    # Sort lanes by coherence key so blocks see small chunk unions;
    # per-lane results are order-independent, so this only affects
    # speed.  Lanes with an empty interval (masked-off visibility
    # rays, dead wavefront lanes) sort to the end, packing into
    # blocks that fail the root slab immediately and cost nothing.
    # All nine per-lane fields ride ONE stacked row gather: separate
    # per-field gathers measured 60 ms vs 8 ms fused at 1M lanes
    # (XLA TPU gather cost is per-row, not per-byte).
    inv_perm = None
    ro_s, rd_s = ro, rd
    if sort_rays and R > block:
        key = jnp.where(t_max <= t_min, jnp.int32(0x7FFFFFFF),
                        _ray_sort_key(cl, ro, rd))
        perm = jnp.argsort(key)
        inv_perm = jnp.argsort(perm)
        # Ints may NOT ride f32 lanes as bit patterns: TPU flushes
        # denormals and canonicalizes NaNs in transit (id 201 came
        # back 0, -1 came back 0x7FC00000 — caught by the bench
        # parity gate).  Ids below 2^24 are EXACT as float values,
        # so convert-and-round instead; larger scenes fall back to a
        # separate integer gather.
        ids_exact = scene.tri_pack.shape[0] < (1 << 24)
        cols = [ro, rd, t_min[:, None], t_max[:, None]]
        if ids_exact:
            cols.append(exclude.astype(jnp.float32)[:, None])
        stk = jnp.concatenate(cols, axis=1)[perm]
        ro_s, rd_s = stk[:, 0:3], stk[:, 3:6]
        t_min, t_max = stk[:, 6], stk[:, 7]
        exclude = stk[:, 8].astype(jnp.int32) if ids_exact \
            else exclude[perm]

    rox, roy, roz = ro_s[:, 0], ro_s[:, 1], ro_s[:, 2]
    rdx, rdy, rdz = rd_s[:, 0], rd_s[:, 1], rd_s[:, 2]
    if pad:
        zf = lambda a: jnp.pad(a, (0, pad))
        rox, roy, roz = zf(rox), zf(roy), zf(roz)
        rdx, rdy, rdz = zf(rdx), zf(rdy), zf(rdz)
        # Padding lanes get an empty interval: every slab test fails.
        t_min = jnp.pad(t_min, (0, pad), constant_values=_BIG)
        t_max = jnp.pad(t_max, (0, pad), constant_values=-_BIG)
        exclude = zf(exclude)

    t, idx = _run(cl.boxes_q, cl.leaf_bits, cl.links, cl.pack,
                  cl.scene_lo, cl.scene_step,
                  rox, roy, roz, rdx, rdy, rdz,
                  t_min, t_max, exclude,
                  cl.half_meta.shape[0], any_hit, block, interpret)
    if pad:
        t, idx = t[:R], idx[:R]
    if inv_perm is not None:
        if scene.tri_pack.shape[0] < (1 << 24):
            # one [R,2] unsort gather; ids are exact as floats
            ti = jnp.stack([t, idx.astype(jnp.float32)],
                           axis=1)[inv_perm]
            t, idx = ti[:, 0], ti[:, 1].astype(jnp.int32)
        else:
            t, idx = t[inv_perm], idx[inv_perm]

    found = idx >= 0
    if any_hit:
        return Hit(t=t, tri=idx, bary_b=jnp.zeros_like(t),
                   bary_c=jnp.zeros_like(t))
    # t and barycentrics are recomputed OUTSIDE the kernel from the
    # winner's original tri_pack row — one [R,12] gather + a few
    # flops replaces two [rows,128] reductions per sweep in the hot
    # loop, and scrubs the MXU contraction's last-ulp noise out of
    # the reported hit (winner SELECTION used the in-kernel values;
    # the reported record is exact f32, same formulas as the brute
    # oracle's _pack_test).
    rows = scene.tri_pack[jnp.clip(idx, 0, scene.tri_pack.shape[0] - 1)]
    rddn = jnp.sum(rd * rows[:, 0:3], axis=-1)
    t_ex = -(jnp.sum(ro * rows[:, 0:3], axis=-1) + rows[:, 3]) \
        / jnp.where(jnp.abs(rddn) > 1e-30, rddn, 1e-30)
    t = jnp.where(found, t_ex, t)
    p = ro + t[:, None] * rd
    beta = rows[:, 4] + jnp.sum(p * rows[:, 5:8], axis=-1)
    gamma = rows[:, 8] + jnp.sum(p * rows[:, 9:12], axis=-1)
    return Hit(t=t, tri=idx,
               bary_b=jnp.where(found, beta, 0.0),
               bary_c=jnp.where(found, gamma, 0.0))
