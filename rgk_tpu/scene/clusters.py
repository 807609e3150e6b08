"""Two-level cluster acceleration structure for the Pallas intersector.

Large scenes cannot keep their triangle pack VMEM-resident, and
per-lane tree traversal needs gathers the TPU does not have.  The
TPU-native shape of the problem (re-design of the reference kd-tree,
reference src/scene.cpp:431-657, for a vector machine):

* triangles are sorted by a binned-SAH BVH sweep (scene/bvh.py) and
  chopped into fixed-size *chunks* of consecutive triangles —
  spatially tight thanks to the DFS ordering, fixed-size so each is a
  whole number of DMA tiles;
* a small skip-link BVH is built over the chunk AABBs; its node
  tables live entirely in SMEM on device (scalar memory — the walk
  reads one node per step, uniform across a ray block);
* the kernel (ops/pallas_cluster.py) walks the chunk tree once per
  ray *block* with a scalar cursor — descend when any live lane's
  slab test passes — and DMA-streams hit chunks' triangle rows from
  HBM into VMEM scratch for dense Badouel sweeps.

v6 encoding (round 5), sized by the measured ~1 MB SMEM scratch
ceiling on TPU v5e (tools/prof_smem_probe.py):

* chunk size AUTO-SCALES: the finest granularity is 64 triangles
  (half a 128-lane DMA tile - sibling halves share one DMA), and the
  chunk doubles until the tree fits CHUNK_CAP leaves.  This removes
  the round-4 ~2.1M-triangle ceiling entirely: node ids always fit
  16-bit links, and bigger scenes just get coarser (but proportionally
  fewer) chunks.  1M tris -> 64-tri chunks; 4M -> 128; 16M -> 512.
* node AABBs are quantized to u16 fixed point per axis (two coords
  per int32 word, 12 B/node instead of 24) with conservative
  floor/ceil rounding, so the slab test stays exact-conservative.
  Mosaic has no scalar bitcast, so bf16 packing is out; integer
  fixed point needs only shifts + sitofp, and the dequant scale
  folds into the per-block precomputed slab terms.
* leaf-ness is one bit per node, 32 nodes per word.
* the eight per-direction-octant link tables live in HBM, and the
  kernel DMAs ONE octant's table per ray block (skipped when the
  previous block used the same octant — the coherence sort makes
  octant runs long), instead of keeping all eight resident.

Cluster pack layout [T*16, 128] float32, coefficient-major (tile k =
rows k*16..(k+1)*16; row j = coefficient j of its 128 triangles):
  0:12  Badouel coefficients (builder.build_tri_pack); thin-glass and
        padding slots are FOLDED to never-hit rows (n=0, d=1 makes
        t = -1/0 = -inf, which fails every interval test) so the
        sweep needs no glass mask at all
  12    thin-glass flag (diagnostic only — the kernel never reads it)
  13    original triangle id, int32 *bitcast* into the float row
        (exclude tests + hit reporting survive the reorder)
  14:16 zero padding
Padding slots carry id=-1.
"""

from __future__ import annotations

import numpy as np

from ..utils import log as out
from .arrays import ClusterArrays, _f32, _i32

HALF = 64          # finest sweep granule: half a 128-lane tile
CHUNK_CAP = 20000  # max tree leaves — keeps every SMEM table in budget


def build_octant_links(first, count, skip, node_min, node_max):
    """Per-direction-octant front-to-back traversal links.

    The canonical skip-link layout fixes one DFS order, so rays
    marching "against" that order sweep far chunks before near ones
    and best_t pruning bites late.  The reference's kd traversal
    visits the near child first per ray (src/scene_intersect.cpp:
    300-321); the TPU equivalent is eight precomputed link tables,
    one per ray-direction octant, over the SAME canonical node ids
    (boxes and leaf flags are shared — only the links differ):

        hit(o, n)  = near child (inner) / chunk id (leaf — identical
                     in every octant)
        miss(o, n) = the octant-DFS successor

    Octant bit a set means the ray direction is negative along axis a.
    The near child of an inner node is chosen by box-center order
    along the axis where the two children are most separated.

    Returned PACKED as int32 [8, N] = (hit << 16) | miss, both
    halves UNSIGNED 16-bit fields (the kernel reads hit as
    (w >> 16) & 0xFFFF) — node ids and the sentinel N must fit
    16 bits, which build_clusters guarantees via CHUNK_CAP.
    """
    n_nodes = len(count)
    assert n_nodes < 65536, "node ids must fit unsigned 16-bit links"
    centers = (np.asarray(node_min) + np.asarray(node_max)) * 0.5
    first = np.asarray(first, np.int64)
    count = np.asarray(count, np.int64)
    skip = np.asarray(skip, np.int64)

    inner = count == 0
    left = np.where(inner, first, 0)
    right = np.where(inner, skip[np.clip(left, 0, n_nodes - 1)], 0)
    d = centers[np.clip(right, 0, n_nodes - 1)] \
        - centers[np.clip(left, 0, n_nodes - 1)]
    split_axis = np.argmax(np.abs(d), axis=1)
    # left_is_lower[n]: the left child sits at the lower coordinate
    # along the split axis.
    left_is_lower = d[np.arange(n_nodes), split_axis] >= 0.0

    links = np.empty((8, n_nodes), np.uint32)
    inner_idx = np.nonzero(inner)[0]  # ascending == DFS pre-order,
    # so every parent is processed before its children and the
    # successor propagation below needs just one linear pass:
    #   miss(near(n)) = far(n);  miss(far(n)) = miss(n)
    for o in range(8):
        neg = np.array([(o >> a) & 1 for a in range(3)], bool)
        # near = lower child for positive direction, upper for negative
        near_is_left = left_is_lower ^ neg[split_axis]
        near = np.where(near_is_left, left, right)
        far = np.where(near_is_left, right, left)
        hit = np.where(inner, near, first).astype(np.uint32)
        miss = np.empty(n_nodes, np.uint32)
        miss[0] = n_nodes
        for n in inner_idx:
            miss[near[n]] = far[n]
            miss[far[n]] = miss[n]
        links[o] = (hit << np.uint32(16)) | miss
    return links.view(np.int32)


def _quantize_boxes(node_min, node_max, lo, step):
    """Conservative u16 fixed-point node boxes, 3 words per node:
    w0 = (qmin_x << 16) | qmin_y, w1 = (qmin_z << 16) | qmax_x,
    w2 = (qmax_y << 16) | qmax_z.  min floors, max ceils, so the
    dequantized box always CONTAINS the true box (slab tests stay
    sound, just up to one quantum looser per face)."""
    inv = 1.0 / step
    qmin = np.floor((np.asarray(node_min, np.float64) - lo) * inv)
    qmax = np.ceil((np.asarray(node_max, np.float64) - lo) * inv)
    qmin = np.clip(qmin, 0, 65535).astype(np.uint32)
    qmax = np.clip(qmax, 0, 65535).astype(np.uint32)
    w = np.empty((len(qmin), 3), np.uint32)
    w[:, 0] = (qmin[:, 0] << 16) | qmin[:, 1]
    w[:, 1] = (qmin[:, 2] << 16) | qmax[:, 0]
    w[:, 2] = (qmax[:, 1] << 16) | qmax[:, 2]
    return w.reshape(-1).view(np.int32)


def _pack_leaf_bits(count):
    """count > 0 -> leaf; one bit per node, 32 per int32 word."""
    n = len(count)
    bits = np.zeros(((n + 31) // 32,), np.uint32)
    leaf = np.nonzero(np.asarray(count) > 0)[0]
    np.bitwise_or.at(bits, leaf // 32,
                     np.uint32(1) << (leaf % 32).astype(np.uint32))
    return bits.view(np.int32)


def build_clusters(vertices: np.ndarray, tri_vidx: np.ndarray,
                   tri_pack: np.ndarray,
                   order=None) -> ClusterArrays:
    """Build the two-level chunk structure.

    tri_pack: [M, 12|13] Badouel pack (13th col = thin-glass flag).
    `order` (optional): a precomputed SAH DFS triangle order — the
    commit passes the leaf-4 BVH's own order so the 1M-tri SAH sweep
    runs ONCE for both structures (the DFS orders differ only in leaf
    granularity, which the fixed-size chop erases anyway).
    """
    from .bvh import _build_numpy, _load_native_builder

    m = tri_vidx.shape[0]
    a = vertices[tri_vidx[:, 0]]
    b = vertices[tri_vidx[:, 1]]
    c = vertices[tri_vidx[:, 2]]
    prim_min = np.minimum(np.minimum(a, b), c)
    prim_max = np.maximum(np.maximum(a, b), c)
    centroids = (prim_min + prim_max) * 0.5

    builder = _load_native_builder()
    build = builder if builder is not None else _build_numpy
    if order is None:
        # Level 1: SAH ordering of the triangles (small leaves =
        # tight chunks after the fixed-size chop).
        _, _, _, _, _, order = build(centroids, prim_min, prim_max, 8)
    order = np.asarray(order, np.int64)

    # Auto chunk size: the tree must keep <= CHUNK_CAP leaves so every
    # node table fits the SMEM budget and ids fit 16-bit links.
    halves_raw = -(-m // HALF)
    chunk_halves = 1
    while -(-halves_raw // chunk_halves) > CHUNK_CAP:
        chunk_halves *= 2
    tiles_per_chunk = max(1, chunk_halves // 2)
    # Pad the triangle count to a whole number of CHUNKS (which for
    # chunk_halves == 1 still means whole tiles: two sibling halves
    # share a DMA tile).
    grain = max(chunk_halves, 2) * HALF
    k = -(-m // grain) * grain
    pad = k - m
    n_tiles = k // 128
    n_chunks = k // (chunk_halves * HALF)

    pmin = prim_min[order]
    pmax = prim_max[order]
    if pad:
        # Padding prims: empty boxes inside the last real box so they
        # never extend a chunk AABB.
        pmin = np.concatenate([pmin, np.repeat(pmin[-1:], pad, axis=0)])
        pmax = np.concatenate([pmax, np.repeat(pmin[-1:], pad, axis=0)])

    csz = chunk_halves * HALF
    ch_min = pmin.reshape(n_chunks, csz, 3).min(axis=1)
    ch_max = pmax.reshape(n_chunks, csz, 3).max(axis=1)
    ch_cent = (ch_min + ch_max) * 0.5

    # Level 2: skip-link tree over the chunks, one chunk per leaf.
    node_min, node_max, first, count, skip, corder = build(
        ch_cent, ch_min, ch_max, 1)
    first = np.asarray(first, np.int64).copy()
    count = np.asarray(count, np.int64)
    corder = np.asarray(corder, np.int64)
    # Leaves reference positions in corder; rewrite to chunk ids so
    # the kernel needs no extra indirection.
    leaf = count > 0
    first[leaf] = corder[first[leaf]]
    n_nodes = len(count)
    assert n_nodes < 65536 and n_chunks < 65536

    # Chunk-ordered triangle pack, stored *coefficient-major*: tile t
    # occupies rows t*16..(t+1)*16 of a [T*16, 128] array, row j =
    # coefficient j of the tile's 128 triangles.  This makes each
    # tile one lane-aligned [16, 128] DMA slice (Mosaic requires HBM
    # slices aligned to 128 lanes).
    pack = np.asarray(tri_pack, np.float32)
    glass = (pack[:, 12] > 0.5) if pack.shape[1] > 12 else \
        np.zeros((m,), bool)
    rows = np.zeros((k, 16), np.float32)
    rows[:m, :12] = pack[order, :12]
    rows[:m, 12] = glass[order].astype(np.float32)
    ids = np.full((k,), -1, np.int32)
    ids[:m] = order.astype(np.int32)
    rows[:, 13] = ids.view(np.float32)
    # Fold thin-glass (never blocks; scene.cpp MakeThinglassSet) and
    # padding into never-hit coefficient rows: n = 0, d = 1 gives
    # rddn = 0, t = -1/0 = -inf, failing t > t_min for any t_min >= 0
    # — the sweep needs no separate glass/pad mask.
    dead = np.zeros((k,), bool)
    dead[:m] = glass[order]
    dead[m:] = True
    rows[dead, :12] = 0.0
    rows[dead, 3] = 1.0
    rows = rows.reshape(n_tiles, 128, 16).transpose(
        0, 2, 1).reshape(n_tiles * 16, 128)

    links = build_octant_links(first, count, skip, node_min, node_max)
    # Row count per octant padded to a multiple of 8 so the kernel's
    # per-octant row-slice DMA stays tile-aligned (Mosaic requires
    # 8-row alignment on sublane slices of HBM arrays; a 3-D
    # traced-index slice faults the device — tools/prof_smem_probe).
    n_sub = -(-(-(-n_nodes // 128)) // 8) * 8
    links_pad = np.zeros((8, n_sub * 128), np.int32)
    links_pad[:, :n_nodes] = links
    links_pad = links_pad.reshape(8 * n_sub, 128)

    # u16 fixed-point quantization frame: the scene box of the tree
    # root, one step per axis (degenerate axes get a unit step).
    lo = np.asarray(node_min[0], np.float64)
    hi = np.asarray(node_max[0], np.float64)
    step = np.maximum((hi - lo) / 65535.0, 1e-30)
    boxes_q = _quantize_boxes(node_min, node_max, lo, step)

    out.log(3, f"Clusters: {n_chunks} x {csz} triangles "
               f"({n_tiles} tiles, chunk_halves={chunk_halves}), "
               f"{n_nodes} tree nodes")
    return ClusterArrays(
        boxes_q=_i32(boxes_q),
        leaf_bits=_i32(_pack_leaf_bits(count)),
        links=_i32(links_pad),
        pack=_f32(rows),
        scene_lo=_f32(lo),
        scene_step=_f32(step),
        half_meta=_i32(np.zeros((chunk_halves,))),
    )


def empty_clusters() -> ClusterArrays:
    """Placeholder for flat scenes (keeps the pytree structure).

    The root is a LEAF (bit set) whose miss link is n_nodes=1, and the
    one pack tile is all padding (never-hit rows, id=-1): if the
    cluster kernel is ever invoked on a flat-scene pytree by mistake,
    every ray does one no-op sweep and terminates instead of looping
    on a degenerate inner node."""
    pack = np.zeros((16, 128), np.float32)
    pack[3, :] = 1.0                        # d=1: never hits
    pack[13, :] = np.full((128,), -1, np.int32).view(np.float32)
    links = np.full((8 * 8, 128), (0 << 16) | 1, np.int32)
    return ClusterArrays(
        boxes_q=_i32(np.zeros((3,))),
        leaf_bits=_i32(np.ones((1,))),
        links=_i32(links),
        pack=_f32(pack),
        scene_lo=_f32(np.zeros((3,))),
        scene_step=_f32(np.full((3,), 1e-30)),
        half_meta=_i32(np.zeros((2,))),
    )
