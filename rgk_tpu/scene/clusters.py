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


def build_clusters(vertices: np.ndarray, tri_vidx: np.ndarray,
                   tri_pack: np.ndarray,
                   cluster_size: int = CLUSTER_SIZE) -> ClusterArrays:
    """Build the two-level cluster structure.

    tri_pack: [M, 12|13] Badouel pack (13th col = thin-glass flag).
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
    # Level 1: SAH ordering of the triangles (small leaves = tight
    # clusters after the fixed-size chop).
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

    # Level 2: binary tree over the clusters (one cluster per leaf),
    # then collapsed to 8-wide nodes so the kernel tests 8 child AABBs
    # per iteration — one [8, BLK] VPU plane, the natural sublane
    # shape, ~8x fewer serial traversal steps than a binary walk.
    node_min, node_max, first, count, skip, corder = build(
        cl_cent, cl_min, cl_max, 1)
    first = np.asarray(first, np.int64).copy()
    count = np.asarray(count, np.int64)
    skip = np.asarray(skip, np.int64)
    corder = np.asarray(corder, np.int64)
    leaf = count > 0
    # Leaves reference positions in corder; rewrite to cluster ids so
    # the kernel needs no extra indirection.
    first[leaf] = corder[first[leaf]]
    n8_min, n8_max, n8_meta = _collapse8(
        np.asarray(node_min, np.float32), np.asarray(node_max, np.float32),
        first, count, skip)

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

    out.log(3, f"Clusters: {n_clusters} x {cluster_size} triangles, "
               f"{n8_meta.shape[0] // 8} wide nodes")
    return ClusterArrays(
        node_min=_f32(n8_min),
        node_max=_f32(n8_max),
        node_meta=_i32(n8_meta),
        pack=_f32(rows),
    )


CHILD_EMPTY = 0
CHILD_LEAF = 1
CHILD_INNER = 2


def _collapse8(bmin, bmax, first, count, skip):
    """Collapse the flat binary tree to 8-wide nodes.

    Binary children of inner node i are (first[i], skip[first[i]])
    (DFS pre-order + skip links, scene/bvh.py).  Each wide node
    repeatedly expands one inner entry of its child set until 8
    entries or all leaves; subtree roots become the next wide nodes.

    Returns (n8_min [N8*8,3] f32, n8_max [N8*8,3] f32,
    n8_meta [N8*8,2] int32 = (kind, value)) with empty slots carrying
    inverted boxes so every slab test fails.
    """
    def children(i):
        left = int(first[i])
        return left, int(skip[left])

    n8_min, n8_max, n8_meta = [], [], []
    # Wide node 0 is the binary root (leaf roots become a 1-leaf node).
    wide_of = {}
    order = [0]
    wide_of[0] = 0
    next_id = 1
    emitted = 0
    while emitted < len(order):
        root = order[emitted]
        emitted += 1
        if count[root] > 0:
            members = [root]
        else:
            members = list(children(root))
            while len(members) < 8:
                inner = [m for m in members if count[m] == 0]
                if not inner:
                    break
                # Expand the widest inner subtree (by skip-link span —
                # a cheap proxy for subtree size) to balance the node.
                inner.sort(key=lambda m: int(skip[m]) - m, reverse=True)
                m = inner[0]
                members.remove(m)
                members.extend(children(m))
        mins = np.full((8, 3), np.inf, np.float32)
        maxs = np.full((8, 3), -np.inf, np.float32)
        meta = np.zeros((8, 2), np.int64)
        for c, m in enumerate(members):
            mins[c] = bmin[m]
            maxs[c] = bmax[m]
            if count[m] > 0:
                meta[c] = (CHILD_LEAF, first[m])
            else:
                if m not in wide_of:
                    wide_of[m] = next_id
                    next_id += 1
                    order.append(m)
                meta[c] = (CHILD_INNER, wide_of[m])
        n8_min.append(mins)
        n8_max.append(maxs)
        n8_meta.append(meta)
    return (np.concatenate(n8_min, axis=0),
            np.concatenate(n8_max, axis=0),
            np.concatenate(n8_meta, axis=0).astype(np.int32))


def empty_clusters() -> ClusterArrays:
    """Placeholder for flat scenes (keeps the pytree structure)."""
    return ClusterArrays(
        node_min=_f32(np.zeros((8, 3))),
        node_max=_f32(np.zeros((8, 3))),
        node_meta=_i32(np.zeros((8, 2))),
        pack=_f32(np.zeros((16, 128))),
    )
