"""Binned cluster traversal: decomposed walk-emit + dense chunk sweeps.

The union-sweep kernel (ops/pallas_cluster.py) pays, per 128-lane
slice, one dense [64,128] Badouel sweep for EVERY leaf chunk any lane
in the slice wants — measured 10-30k tri-tests/ray on divergent
bounce/shadow regimes where a lone ray needs ~600 (see
tools/prof_block_sweep.py, tools/prof_leafdist.py).  This module
splits traversal into phases so each runs dense:

1. `walk-emit` kernel: ray blocks run the same shared frontier march
   over the SMEM chunk tree, but instead of sweeping, each lane
   APPENDS the chunk ids its slab test passes to a capped per-lane
   list (K vector-select planes — a TPU-native "per-lane push").
   A lane whose list fills caps its interval at the entry t of the
   first SKIPPED chunk (`skipmin`) — the walk then prunes deeper
   nodes for that lane, which restores the per-ray early-out economy
   of the reference's kd traversal (reference
   src/scene_intersect.cpp:211-327) at list granularity.
2. XLA glue: the [R, K] lists flatten into (chunk, ray) pairs, one
   `lax.sort` groups them by chunk, one row gather fetches each
   pair's ray data, and a reverse-cummin precomputes run boundaries
   so the sweep kernel's scalar loop steps run-to-run.
3. `binned-sweep` kernel: each 1024-pair block runs dense [64,128]
   sweeps of its (few, sorted-adjacent) chunks against exactly the
   rays that asked for them — tri-tests/ray drops to ~64*lists/ray,
   and consecutive same-chunk runs reuse the DMA'd + transposed tile.
4. Lanes whose cap truncated the walk re-enter the UNION kernel with
   the window (skipmin, best-found) — usually empty, always exact.

Measured on the 1M-tri sphere regimes at 256k rays (TPU v5e,
tools/prof_block_sweep.py ray sets): sorted-random 1.18 vs the union
kernel's 1.04 Mrays/s, shadow-fan closest 1.31 vs 0.87, shadow-fan
any-hit 1.27 vs 0.73; coherent camera bundles 2.25 vs 6.0 (the union
kernel's shared walk + gated sweeps are near-optimal there).  The
pipeline's fixed XLA glue — one R*K-element sort, a pair row gather
and a result unsort-sort (~50-90 ms at 1M lanes) — is what the dense
sweeps must amortize: on the real colonnade wavefront mix, where rays
are semi-coherent and most visibility lanes are masked dead, it does
not (e2e 7.1 -> 9.1 s/round routing shadows here), so make_intersector
defaults to the union kernel (RGK_BINNED=off).  The module stays: it
is the measured-correct scaffold for chunk-binned traversal, exact vs
the union kernel on every regime, and the glue costs (not the
kernels) are the open item.

The walk's frontier batches up to 24 nodes per vector->scalar sync:
per-candidate any-hit bits are distinct powers of two accumulated in
vector values, so one scalar read of the sum recovers the whole
batch's bits (the union kernel's per-slice sweep gating needed K*S
bits and capped at 8).  Stack pushes are unconditional stores into
free slots — measured 5x faster than the pl.when-per-candidate
variant, whose predicated VMEM read-modify-writes serialized the
pipeline.

Same hit/report semantics as intersect_clusters: winner (t, tri) by
(min t, min id), exact t/barycentrics recomputed from the original
tri_pack row outside the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit
from .pallas_cluster import (_LANES, _ray_sort_key, _sweep_rows,
                             intersect_clusters)

_BIG = 3.4e38
_SENT = 0x7FFFFF00          # sort key for invalid pairs (> any chunk id)
DEFAULT_BLOCK = 2048        # walk block (measured over 1024/2048/4096)
DEFAULT_K = 8               # per-lane emit cap (pairs array is R*K)
_KF = 24                    # frontier nodes slab-tested per sync
_SROWS = 8                  # sweep-kernel pair rows per grid step


def _make_walk_kernel(n_sub: int, K: int, stats: bool):
    """Walk the chunk tree per ray block, emit per-lane chunk lists."""

    def kernel(boxes_hbm, bits_hbm, links_hbm, oct_ref, lo_ref, step_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               tmin_ref, tmax_ref,
               ids_ref, cnt_ref, skip_ref,
               *rest):
        if stats:
            nodes_ref = rest[0]
            rest = rest[1:]
        (boxes_ref, bits_ref, links_ref, tab_sem, prev_ref,
         stack_ref) = rest

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

        rox2, roy2, roz2 = rox_ref[0], roy_ref[0], roz_ref[0]
        rdx2, rdy2, rdz2 = rdx_ref[0], rdy_ref[0], rdz_ref[0]
        tmin2 = tmin_ref[0]
        tmax2 = tmax_ref[0]

        def inv(c):
            tiny = jnp.where(c >= 0.0, 1e-20, -1e-20)
            return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, tiny)

        lox, loy, loz = lo_ref[0], lo_ref[1], lo_ref[2]
        stx, sty, stz = step_ref[0], step_ref[1], step_ref[2]
        rqx = (rox2 - lox) / stx
        rqy = (roy2 - loy) / sty
        rqz = (roz2 - loz) / stz
        ivx = stx * inv(rdx2)
        ivy = sty * inv(rdy2)
        ivz = stz * inv(rdz2)

        for k in range(K):
            ids_ref[0, k] = jnp.full((n_sub, _LANES), -1, jnp.int32)
        cnt_ref[0] = jnp.zeros((n_sub, _LANES), jnp.int32)
        skip_ref[0] = jnp.full((n_sub, _LANES), _BIG, jnp.float32)

        def unpack_hi(w):
            return ((w >> 16) & 0xFFFF).astype(jnp.float32)

        def unpack_lo(w):
            return (w & 0xFFFF).astype(jnp.float32)

        def slab_hits(n, tcap):
            """[S,128] hit mask + entry t (world units) of node n."""
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
            return hit, tn

        def link_at(n):
            return links_ref[n >> 7, n & 127]

        def is_leaf(n):
            return ((bits_ref[n >> 5] >> (n & 31)) & 1) > 0

        stack_ref[0] = 0  # root

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            top, steps_v = carry
            # Per-lane cap: once a lane's list is full, nodes entered
            # past its first skipped chunk cannot matter (their
            # content is covered by the pass-2 window).
            full = cnt_ref[0] >= K
            tcap = jnp.minimum(tmax2, jnp.where(full, skip_ref[0],
                                                _BIG))

            k_eff = jnp.minimum(jnp.int32(_KF), top)
            ns = []
            # Phase A: batched slab tests -> one any-hit bit per
            # candidate, accumulated in vector values (distinct powers
            # of two, so the sum is the OR); one sync per batch.
            acc = jnp.zeros((1, 1), jnp.int32)
            for i in range(_KF):
                n = stack_ref[jnp.maximum(top - 1 - i, 0)]
                ns.append(n)
                hit, _ = slab_hits(n, tcap)
                acc = acc + jnp.max(
                    jnp.where(hit & (i < k_eff), jnp.int32(1 << i), 0),
                    keepdims=True)
            # ONE vector->scalar sync for the whole batch.
            bits_all = jnp.sum(acc)

            top2 = top - k_eff
            decisions = []
            for i in range(_KF):
                hit_any = ((bits_all >> i) & 1) == 1
                wlink = link_at(ns[i])
                near = (wlink >> 16) & 0xFFFF
                leaf = is_leaf(ns[i])
                decisions.append((hit_any, leaf, near))

                # Phase B: emit hit leaves.  The per-lane mask is
                # recomputed here (keeping 24 masks live would spill);
                # cnt/skip refs may have advanced within this round,
                # which only narrows the mask conservatively — skipped
                # content stays covered by the skipmin window.
                @pl.when(hit_any & leaf)
                def _emit(i=i, n=ns[i], near=near):
                    m, tn = slab_hits(n, tcap)
                    c = cnt_ref[0]
                    for k in range(K):
                        sel = m & (c == k)
                        ids_ref[0, k] = jnp.where(sel, near,
                                                  ids_ref[0, k])
                    over = m & (c >= K)
                    # conservative down-nudge: pass 2 re-tests with
                    # strict t > skipmin, so a hit exactly on the
                    # skipped box face must stay inside the window
                    tn_c = tn - jnp.abs(tn) * 2e-7 - 1e-30
                    skip_ref[0] = jnp.where(
                        over, jnp.minimum(skip_ref[0], tn_c),
                        skip_ref[0])
                    cnt_ref[0] = c + m.astype(jnp.int32)

            for i in range(_KF - 1, -1, -1):
                hit_any, leaf, near = decisions[i]
                push = hit_any & ~leaf
                # unconditional stores: slots at/above top2 are free
                # space, so a non-push simply leaves garbage that the
                # next push overwrites (cheaper than a branch).
                stack_ref[top2] = link_at(near) & 0xFFFF
                stack_ref[top2 + 1] = near
                top2 = top2 + 2 * push.astype(jnp.int32)

            return (top2, steps_v + k_eff)

        _, n_nodes_v = jax.lax.while_loop(cond, body,
                                          (jnp.int32(1), jnp.int32(0)))
        if stats:
            nodes_ref[0] = jnp.full((n_sub, _LANES), n_nodes_v,
                                    jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("K", "block", "interpret", "stats"))
def _run_walk(boxes_q, leaf_bits, links, scene_lo, scene_step,
              rox, roy, roz, rdx, rdy, rdz, t_min, t_max,
              K, block, interpret, stats=False):
    R = rox.shape[0]
    n_sub = block // _LANES
    grid = (R // block,)
    n_nodes = int(boxes_q.shape[0]) // 3

    o = ((rdx < 0).astype(jnp.int32) + 2 * (rdy < 0).astype(jnp.int32)
         + 4 * (rdz < 0).astype(jnp.int32)).reshape(grid[0], block)
    hist = jnp.sum(o[:, :, None] == jnp.arange(8)[None, None, :],
                   axis=1)
    oct = jnp.argmax(hist, axis=1).astype(jnp.int32)

    def shape3(a):
        return a.reshape(grid[0], n_sub, _LANES)

    lane_spec = pl.BlockSpec((1, n_sub, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    ids_spec = pl.BlockSpec((1, K, n_sub, _LANES),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    n_sub_links = links.shape[0] // 8
    out_shape = [
        jax.ShapeDtypeStruct((grid[0], K, n_sub, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((grid[0], n_sub, _LANES), jnp.float32),
    ]
    out_specs = [ids_spec, lane_spec, lane_spec]
    if stats:
        out_shape.append(jax.ShapeDtypeStruct(
            (grid[0], n_sub, _LANES), jnp.int32))
        out_specs.append(lane_spec)
    outs = pl.pallas_call(
        _make_walk_kernel(n_sub, K, stats),
        grid=grid,
        in_specs=[hbm, hbm, hbm,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [lane_spec] * 8,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.SMEM((n_nodes * 3,), jnp.int32),     # quantized boxes
            pltpu.SMEM((leaf_bits.shape[0],), jnp.int32),
            pltpu.SMEM((n_sub_links, _LANES), jnp.int32),  # octant page
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),               # resident octant
            pltpu.SMEM((4096,), jnp.int32),            # frontier stack
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(boxes_q, leaf_bits, links, oct, scene_lo, scene_step,
      shape3(rox), shape3(roy), shape3(roz), shape3(rdx),
      shape3(rdy), shape3(rdz), shape3(t_min), shape3(t_max))
    ids = outs[0].transpose(0, 2, 3, 1).reshape(R, K)
    cnt = outs[1].reshape(R)
    skipmin = outs[2].reshape(R)
    if stats:
        return ids, cnt, skipmin, outs[3].reshape(R)
    return ids, cnt, skipmin


def _make_sweep_kernel(tpc: int, half_leaf: bool):
    """Dense sweeps over sorted (chunk, ray) pair blocks of
    [_SROWS, 128]; run boundaries precomputed by the glue."""

    def kernel(cid_ref, rend_ref, pack_hbm,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               tmin_ref, tcap_ref, excl_ref,
               t_ref, idx_ref,
               tile_ref, tilt_ref, sem_ref, prev_t_ref):

        @pl.when(pl.program_id(0) == 0)
        def _init_prev():
            prev_t_ref[0] = -1

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        t_ref[0] = jnp.full((_SROWS, _LANES), _BIG, jnp.float32)
        idx_ref[0] = jnp.full((_SROWS, _LANES), -1, jnp.int32)

        def fetch(tile):
            """DMA + transpose chunk tile(s) into tilt_ref, reusing
            the previous run's work when the tile repeats (sorted
            pairs make long same-chunk runs)."""
            @pl.when(tile != prev_t_ref[0])
            def _dma():
                cp = pltpu.make_async_copy(
                    pack_hbm.at[pl.ds(tile * (16 * tpc), 16 * tpc), :],
                    tile_ref, sem_ref.at[0])
                cp.start()
                cp.wait()
                for ti in range(tpc):
                    tilt_ref[ti * 128:(ti + 1) * 128, :] = \
                        tile_ref[ti * 16:(ti + 1) * 16, :].T
                prev_t_ref[0] = tile

        for r in range(_SROWS):
            base = r * _LANES
            rays = (rox_ref[0, r:r + 1, :], roy_ref[0, r:r + 1, :],
                    roz_ref[0, r:r + 1, :], rdx_ref[0, r:r + 1, :],
                    rdy_ref[0, r:r + 1, :], rdz_ref[0, r:r + 1, :])
            tmin2 = tmin_ref[0, r:r + 1, :]
            tcap2 = tcap_ref[0, r:r + 1, :]
            excl2 = excl_ref[0, r:r + 1, :]

            def run_body(j, r=r, base=base, rays=rays, tmin2=tmin2,
                         tcap2=tcap2, excl2=excl2):
                c = cid_ref[base + j]
                e = rend_ref[base + j]

                @pl.when(c < _SENT)
                def _sweep(c=c, j=j, e=e):
                    if half_leaf:
                        fetch(c >> 1)
                        rows = tilt_ref[pl.ds((c & 1) * 64, 64), :]
                    else:
                        fetch(c)
                        rows = tilt_ref[...]
                    m = (lane >= j) & (lane < e)
                    bt = t_ref[0, r:r + 1, :]
                    bi = idx_ref[0, r:r + 1, :]
                    ts, is_ = _sweep_rows(
                        rows, rays,
                        jnp.where(m, tmin2, _BIG),
                        jnp.where(m, jnp.minimum(tcap2, bt), -_BIG),
                        excl2, (bt, bi), False)
                    t_ref[0, r:r + 1, :] = ts
                    idx_ref[0, r:r + 1, :] = is_

                return e

            jax.lax.while_loop(lambda j: j < _LANES, run_body,
                               jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("chunk_halves", "interpret"))
def _run_sweep(pack, cid, rend, rox, roy, roz, rdx, rdy, rdz,
               tmin, tcap, excl, chunk_halves, interpret):
    P = cid.shape[0]
    grid = (P // (_SROWS * _LANES),)
    tpc = max(1, chunk_halves // 2)
    half_leaf = chunk_halves == 1

    lane_spec = pl.BlockSpec((1, _SROWS, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((_SROWS * _LANES,), lambda i: (i,),
                             memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    def shape3(a):
        return a.reshape(grid[0], _SROWS, _LANES)

    t, idx = pl.pallas_call(
        _make_sweep_kernel(tpc, half_leaf),
        grid=grid,
        in_specs=[smem_spec, smem_spec, hbm] + [lane_spec] * 9,
        out_specs=(lane_spec, lane_spec),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0], _SROWS, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((grid[0], _SROWS, _LANES),
                                 jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((16 * tpc, _LANES), jnp.float32),   # raw tile
            pltpu.VMEM((128 * tpc, 16), jnp.float32),      # transposed
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((1,), jnp.int32),                   # resident tile
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(cid, rend, pack, shape3(rox), shape3(roy), shape3(roz),
      shape3(rdx), shape3(rdy), shape3(rdz), shape3(tmin),
      shape3(tcap), shape3(excl))
    return t.reshape(P), idx.reshape(P)


def _run_ends(cid_sorted):
    """For each pair j, the (exclusive, row-local) end of the
    same-chunk run containing j, rows of 128."""
    rows = cid_sorted.reshape(-1, _LANES)
    chg = jnp.concatenate(
        [rows[:, 1:] != rows[:, :-1],
         jnp.ones((rows.shape[0], 1), bool)], axis=1)
    li = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    first_chg = jax.lax.cummin(
        jnp.where(chg, li, _LANES)[:, ::-1], axis=1)[:, ::-1]
    return (first_chg + 1).reshape(-1)


def intersect_clusters_binned(scene, ro, rd, t_min, t_max, exclude=None,
                              any_hit: bool = False,
                              block: int = DEFAULT_BLOCK,
                              K: int = DEFAULT_K,
                              interpret: bool = False,
                              sort_rays: bool = True) -> Hit:
    """Drop-in cluster intersector on the binned pipeline.

    Same contract as intersect_clusters (requires scene.clusters and
    t_min >= 0).  `any_hit` affects only reporting (witness) — the
    pipeline itself is mode-free."""
    cl = scene.clusters
    R = ro.shape[0]
    assert block % _LANES == 0
    Rp = -(-R // block) * block
    pad = Rp - R

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if exclude is None:
        exclude = jnp.full((R,), -1, jnp.int32)

    inv_perm = None
    ro_s, rd_s = ro, rd
    tmin_s, tmax_s, excl_s = t_min, t_max, exclude
    if sort_rays and R > block:
        key = jnp.where(t_max <= t_min, jnp.int32(0x7FFFFFFF),
                        _ray_sort_key(cl, ro, rd))
        perm = jnp.argsort(key)
        inv_perm = jnp.argsort(perm)
        # one stacked f32 row gather (per-field gathers cost ~7x
        # more); ints gather separately — f32 lanes flush/canonicalize
        # int bit patterns on TPU.
        stk = jnp.concatenate(
            [ro, rd, t_min[:, None], t_max[:, None]], axis=1)[perm]
        ro_s, rd_s = stk[:, 0:3], stk[:, 3:6]
        tmin_s, tmax_s = stk[:, 6], stk[:, 7]
        excl_s = exclude[perm]

    rox, roy, roz = ro_s[:, 0], ro_s[:, 1], ro_s[:, 2]
    rdx, rdy, rdz = rd_s[:, 0], rd_s[:, 1], rd_s[:, 2]
    if pad:
        zf = lambda a: jnp.pad(a, (0, pad))
        rox, roy, roz = zf(rox), zf(roy), zf(roz)
        rdx, rdy, rdz = zf(rdx), zf(rdy), zf(rdz)
        tmin_s = jnp.pad(tmin_s, (0, pad), constant_values=_BIG)
        tmax_s = jnp.pad(tmax_s, (0, pad), constant_values=-_BIG)
        excl_s = zf(excl_s)

    ids, cnt, skipmin = _run_walk(
        cl.boxes_q, cl.leaf_bits, cl.links, cl.scene_lo, cl.scene_step,
        rox, roy, roz, rdx, rdy, rdz, tmin_s, tmax_s,
        K, block, interpret)

    # ---- pair phase: group (chunk, ray) pairs by chunk.
    flat = ids.reshape(Rp * K)
    pair_key = jnp.where(flat >= 0, flat, jnp.int32(_SENT))
    pos = jnp.arange(Rp * K, dtype=jnp.int32)
    cid_sorted, pos_sorted = jax.lax.sort([pair_key, pos], num_keys=1)
    ray_of = pos_sorted // K
    rend = _run_ends(cid_sorted)

    # one row gather for all per-pair ray data
    ray8 = jnp.stack(
        [rox, roy, roz, rdx, rdy, rdz, tmin_s, tmax_s], axis=1)
    pairs = ray8[ray_of]
    pair_excl = excl_s[ray_of]
    tp, ip = _run_sweep(
        cl.pack, cid_sorted, rend,
        pairs[:, 0], pairs[:, 1], pairs[:, 2],
        pairs[:, 3], pairs[:, 4], pairs[:, 5],
        pairs[:, 6], pairs[:, 7], pair_excl,
        cl.half_meta.shape[0], interpret)

    # ---- reduce per ray: restore original pair order, min over K.
    _, t_back, i_back = jax.lax.sort(
        [pos_sorted, tp, ip], num_keys=1)
    t_k = t_back.reshape(Rp, K)
    i_k = i_back.reshape(Rp, K)
    best_t = jnp.min(t_k, axis=1)
    best_i = jnp.min(jnp.where(t_k == best_t[:, None], i_k,
                               jnp.int32(0x7FFFFFFF)), axis=1)
    best_i = jnp.where(best_t < _BIG, best_i, -1)

    # ---- pass 2: lanes whose cap truncated the walk re-run the
    # union kernel over the uncovered window (skipmin, upper).
    lower = jnp.maximum(skipmin, tmin_s)
    upper = jnp.minimum(best_t, tmax_s)
    need = lower < upper
    if any_hit:
        # witness semantics: any hit settles the lane — only hitless
        # truncated lanes need the uncovered window.
        need = need & (best_i < 0)
    p2_tmin = jnp.where(need, lower, _BIG)
    p2_tmax = jnp.where(need, upper, -_BIG)
    ro_p = jnp.stack([rox, roy, roz], axis=1)
    rd_p = jnp.stack([rdx, rdy, rdz], axis=1)
    h2 = intersect_clusters(scene, ro_p, rd_p, p2_tmin, p2_tmax,
                            exclude=excl_s, any_hit=False,
                            interpret=interpret)
    win2 = h2.t < best_t
    best_t = jnp.where(win2, h2.t, best_t)
    best_i = jnp.where(win2, h2.tri, best_i)

    if pad:
        best_t, best_i = best_t[:R], best_i[:R]
    if inv_perm is not None:
        best_t, best_i = best_t[inv_perm], best_i[inv_perm]

    found = best_i >= 0
    if any_hit:
        return Hit(t=best_t, tri=jnp.where(found, 0, -1),
                   bary_b=jnp.zeros_like(best_t),
                   bary_c=jnp.zeros_like(best_t))
    # exact winner recompute, same as intersect_clusters
    rows = scene.tri_pack[jnp.clip(best_i, 0,
                                   scene.tri_pack.shape[0] - 1)]
    rddn = jnp.sum(rd * rows[:, 0:3], axis=-1)
    t_ex = -(jnp.sum(ro * rows[:, 0:3], axis=-1) + rows[:, 3]) \
        / jnp.where(jnp.abs(rddn) > 1e-30, rddn, 1e-30)
    t = jnp.where(found, t_ex, best_t)
    p = ro + t[:, None] * rd
    beta = rows[:, 4] + jnp.sum(p * rows[:, 5:8], axis=-1)
    gamma = rows[:, 8] + jnp.sum(p * rows[:, 9:12], axis=-1)
    return Hit(t=t, tri=best_i,
               bary_b=jnp.where(found, beta, 0.0),
               bary_c=jnp.where(found, gamma, 0.0))
