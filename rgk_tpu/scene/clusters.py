"""Two-level cluster acceleration structure for the Pallas intersector.

Large scenes cannot keep their triangle pack VMEM-resident, and
per-lane tree traversal needs gathers the TPU does not have.  The
TPU-native shape of the problem (re-design of the reference kd-tree,
reference src/scene.cpp:431-657, for a vector machine):

* triangles are sorted by a binned-SAH BVH sweep (scene/bvh.py) and
  chopped into fixed-size *clusters* of CLUSTER_SIZE consecutive
  triangles — spatially tight thanks to the DFS ordering, fixed-size
  so each is one DMA granule;
* a small skip-link BVH is built over the cluster AABBs; its node
  arrays are tiny (2*K-1 nodes for K clusters) and live entirely in
  VMEM;
* the kernel (ops/pallas_cluster.py) walks the cluster tree once per
  ray *block* with a scalar cursor — descend when any live lane's
  slab test passes — and DMA-streams hit clusters' triangle rows from
  HBM into VMEM scratch for a dense [C, BLK] Badouel sweep.

Cluster pack layout [K*16, 128] float32, coefficient-major (cluster k
= rows k*16..(k+1)*16; row j = coefficient j of its 128 triangles):
  0:12  Badouel coefficients (builder.build_tri_pack)
  12    thin-glass flag (never blocks; scene.cpp MakeThinglassSet)
  13    original triangle id, int32 *bitcast* into the float row
        (exclude tests + hit reporting survive the reorder)
  14:16 zero padding
Padding slots (the ragged last cluster) carry glass=1 and id=-1.
"""

from __future__ import annotations

import numpy as np

from ..utils import log as out
from .arrays import ClusterArrays, _f32, _i32

CLUSTER_SIZE = 128


def build_octant_links(first, count, skip, node_min, node_max):
    """Per-direction-octant front-to-back traversal links.

    The canonical skip-link layout fixes one DFS order, so rays
    marching "against" that order sweep far clusters before near ones
    and best_t pruning bites late.  The reference's kd traversal
    visits the near child first per ray (src/scene_intersect.cpp:
    300-321); the TPU equivalent is eight precomputed link tables,
    one per ray-direction octant, over the SAME canonical node ids
    (boxes and counts are shared — only the links differ):

        links[o, 2n]   = hit target: near child (inner) / cluster id
                         (leaf — identical in every octant)
        links[o, 2n+1] = miss/done target: the octant-DFS successor

    Octant bit a set means the ray direction is negative along axis a.
    The near child of an inner node is chosen by box-center order
    along the axis where the two children are most separated.

    Returned PACKED as int32 [8, N] = (hit << 16) | miss so all eight
    tables fit the kernel's SMEM budget (node ids and the sentinel
    N must fit 16 bits — build_clusters asserts n_nodes < 32768).
    """
    n_nodes = len(count)
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

    links = np.empty((8, n_nodes), np.int32)
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
        hit = np.where(inner, near, first).astype(np.int32)
        miss = np.empty(n_nodes, np.int32)
        miss[0] = n_nodes
        for n in inner_idx:
            miss[near[n]] = far[n]
            miss[far[n]] = miss[n]
        links[o] = (hit << 16) | miss
    return links


def build_clusters(vertices: np.ndarray, tri_vidx: np.ndarray,
                   tri_pack: np.ndarray,
                   cluster_size: int = CLUSTER_SIZE,
                   order=None) -> ClusterArrays:
    """Build the two-level cluster structure.

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
        # tight clusters after the fixed-size chop).
        _, _, _, _, _, order = build(centroids, prim_min, prim_max, 8)

    k = -(-m // cluster_size) * cluster_size
    pad = k - m
    order = np.asarray(order, np.int64)
    pmin = prim_min[order]
    pmax = prim_max[order]
    if pad:
        # Padding prims: empty boxes inside the last real box so they
        # never extend a cluster AABB.
        pmin = np.concatenate([pmin, np.repeat(pmin[-1:], pad, axis=0)])
        pmax = np.concatenate([pmax, np.repeat(pmin[-1:], pad, axis=0)])

    n_clusters = k // cluster_size
    cl_min = pmin.reshape(n_clusters, cluster_size, 3).min(axis=1)
    cl_max = pmax.reshape(n_clusters, cluster_size, 3).max(axis=1)
    cl_cent = (cl_min + cl_max) * 0.5

    # Level 2: skip-link tree over the clusters, one cluster per leaf.
    node_min, node_max, first, count, skip, corder = build(
        cl_cent, cl_min, cl_max, 1)
    first = np.asarray(first, np.int64).copy()
    count = np.asarray(count, np.int64)
    corder = np.asarray(corder, np.int64)
    # Leaves reference positions in corder; rewrite to cluster ids so
    # the kernel needs no extra indirection.
    leaf = count > 0
    first[leaf] = corder[first[leaf]]
    meta = np.stack([first, count, np.asarray(skip, np.int64)],
                    axis=1).astype(np.int32)

    # Cluster-ordered triangle pack with glass + id columns, stored
    # *coefficient-major*: cluster k occupies rows k*16..(k+1)*16 of a
    # [K*16, 128] array, row j = coefficient j of the cluster's 128
    # triangles.  This makes each cluster one lane-aligned [16, 128]
    # DMA tile (Mosaic requires HBM slices aligned to 128 lanes) and
    # lets the kernel broadcast coefficients as [1, 128] rows with no
    # transposes.
    pack = np.asarray(tri_pack, np.float32)
    if pack.shape[1] < 13:
        pack = np.concatenate(
            [pack, np.zeros((m, 1), np.float32)], axis=1)
    rows = np.zeros((k, 16), np.float32)
    rows[:m, :13] = pack[order]
    ids = np.full((k,), -1, np.int32)
    ids[:m] = order.astype(np.int32)
    rows[:, 13] = ids.view(np.float32)
    if pad:
        rows[m:, 12] = 1.0  # glass: padding rows never hit
    rows = rows.reshape(n_clusters, cluster_size, 16).transpose(
        0, 2, 1).reshape(n_clusters * 16, cluster_size)

    if meta.shape[0] >= 32768:
        # Not an assert: under python -O a silent (hit << 16) overflow
        # would corrupt traversal links for >~2.1M-tri scenes.
        raise ValueError(
            "cluster tree exceeds 16-bit node ids (~2.1M triangles at "
            "cluster size 128); raise cluster_size for larger scenes")
    links = build_octant_links(meta[:, 0], meta[:, 1], meta[:, 2],
                               node_min, node_max)
    out.log(3, f"Clusters: {n_clusters} x {cluster_size} triangles, "
               f"{meta.shape[0]} tree nodes")
    return ClusterArrays(
        node_min=_f32(node_min),
        node_max=_f32(node_max),
        node_meta=_i32(meta),
        pack=_f32(rows),
        octant_links=_i32(links),
    )


def empty_clusters() -> ClusterArrays:
    """Placeholder for flat scenes (keeps the pytree structure).

    The root is a LEAF (count=1) whose miss link is n_nodes=1, and the
    one pack cluster is all padding (glass=1, id=-1): if the cluster
    kernel is ever invoked on a flat-scene pytree by mistake, every ray
    does one no-op sweep and terminates instead of looping on a
    degenerate inner node."""
    pack = np.zeros((16, 128), np.float32)
    pack[12, :] = 1.0                       # glass: never hits
    pack[13, :] = np.full((128,), -1, np.int32).view(np.float32)
    return ClusterArrays(
        node_min=_f32(np.zeros((1, 3))),
        node_max=_f32(np.zeros((1, 3))),
        node_meta=_i32(np.array([[0, 1, 1]])),
        pack=_f32(pack),
        octant_links=_i32(np.ones((8, 1))),
    )
