#!/usr/bin/env python
"""Per-ray leaf-visit distribution over the cluster tree.

For the binned-traversal design (walk-emit + dense binned sweeps) the
two numbers that matter are (a) how many leaves a lone ray's slab
test passes WITHOUT best-t pruning (that is the emit-list length) and
(b) how many it passes WITH in-order pruning (the reference-style
early-out economy, src/scene_intersect.cpp:211-327).  (a)/(b) is the
price of deferring all sweeps to the binned phase; the tail of (a)
sets the emit cap K and the overflow fraction.

Usage: python tools/prof_leafdist.py [--tris 1000000] [--rays 1500]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def walk(ro, rd, tmin, tmax, bmin, bmax, leaf, links16, first, pack_rows,
         prune):
    """Skip-link walk of one ray; returns (#slab-pass leaves, emission
    index of the leaf containing the final hit, hit t)."""
    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))
    o = (1 if rd[0] < 0 else 0) | (2 if rd[1] < 0 else 0) \
        | (4 if rd[2] < 0 else 0)
    hit_l = links16[o, :, 0]
    miss_l = links16[o, :, 1]
    n_nodes = bmin.shape[0]
    n = 0
    tcap = tmax
    count = 0
    hit_emit = -1
    best = np.inf
    while n < n_nodes:
        t0 = (bmin[n] - ro) * inv
        t1 = (bmax[n] - ro) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        ok = (tf >= tn) and (tf >= tmin) and (tn <= tcap)
        if not ok:
            n = miss_l[n]
            continue
        if leaf[n]:
            chunk = hit_l[n]
            count += 1
            rows = pack_rows[chunk]        # [csz, 16]
            rddn = rows[:, 0:3] @ rd
            t = -(rows[:, 0:3] @ ro + rows[:, 3]) / np.where(
                np.abs(rddn) > 1e-30, rddn, 1e-30)
            p = ro[None, :] + t[:, None] * rd[None, :]
            beta = rows[:, 4] + (p * rows[:, 5:8]).sum(1)
            gamma = rows[:, 8] + (p * rows[:, 9:12]).sum(1)
            okt = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1.0) \
                & (t > tmin) & (t < min(tcap, best))
            if okt.any():
                tbest = t[okt].min()
                if tbest < best:
                    best = tbest
                    hit_emit = count
                if prune:
                    tcap = min(tcap, best)
            n = miss_l[n]
        else:
            n = hit_l[n]
    return count, hit_emit, best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--rays", type=int, default=1200)
    args = ap.parse_args()

    from tools.prof_bvh import make_uv_sphere_obj
    from rgk_tpu.io.obj import load_obj
    from rgk_tpu.scene.builder import build_tri_pack
    from rgk_tpu.scene.clusters import build_clusters

    obj = "/tmp/prof_cluster_sphere.obj"
    n = make_uv_sphere_obj(obj, args.tris)
    meshes, _ = load_obj(obj)
    verts, tris = meshes[0].positions, meshes[0].faces
    pack = build_tri_pack(verts, tris)
    cl = build_clusters(verts, tris, pack)

    boxes = np.asarray(cl.boxes_q).view(np.uint32).reshape(-1, 3)
    lo = np.asarray(cl.scene_lo, np.float64)
    step = np.asarray(cl.scene_step, np.float64)
    qminx = (boxes[:, 0] >> 16).astype(np.float64)
    qminy = (boxes[:, 0] & 0xFFFF).astype(np.float64)
    qminz = (boxes[:, 1] >> 16).astype(np.float64)
    qmaxx = (boxes[:, 1] & 0xFFFF).astype(np.float64)
    qmaxy = (boxes[:, 2] >> 16).astype(np.float64)
    qmaxz = (boxes[:, 2] & 0xFFFF).astype(np.float64)
    bmin = np.stack([qminx, qminy, qminz], 1) * step + lo
    bmax = np.stack([qmaxx, qmaxy, qmaxz], 1) * step + lo

    n_nodes = boxes.shape[0]
    lw = np.asarray(cl.links).reshape(8, -1)[:, :n_nodes].view(np.uint32)
    links16 = np.stack([(lw >> 16) & 0xFFFF, lw & 0xFFFF],
                       axis=2).astype(np.int64)
    bits = np.asarray(cl.leaf_bits).view(np.uint32)
    leaf = (bits[np.arange(n_nodes) // 32]
            >> (np.arange(n_nodes) % 32)) & 1 > 0
    first = None

    # pack rows back to triangle-major per chunk
    chunk_halves = cl.half_meta.shape[0]
    csz = 64 * max(chunk_halves, 1)
    rows = np.asarray(cl.pack)                   # [T*16, 128]
    n_tiles = rows.shape[0] // 16
    tri_major = rows.reshape(n_tiles, 16, 128).transpose(0, 2, 1) \
        .reshape(n_tiles * 128, 16)
    n_chunks = tri_major.shape[0] // csz
    pack_rows = tri_major.reshape(n_chunks, csz, 16)

    rng = np.random.default_rng(0)
    R = args.rays
    # sorted-random proxy: origins on a shell, random inward directions
    ro_a = rng.uniform(-1, 1, (R, 3)).astype(np.float64)
    ro_a /= np.linalg.norm(ro_a, axis=1, keepdims=True)
    ro_a *= 2.0
    rd_a = rng.uniform(-1, 1, (R, 3)).astype(np.float64)
    rd_a /= np.linalg.norm(rd_a, axis=1, keepdims=True)

    for prune in (False, True):
        cnt = np.zeros(R, np.int64)
        hidx = np.zeros(R, np.int64)
        for i in range(R):
            c, h, _ = walk(ro_a[i], rd_a[i], 1e-4, 1e9, bmin, bmax,
                           leaf, links16, None, pack_rows, prune)
            cnt[i] = c
            hidx[i] = h
        tag = "pruned " if prune else "no-prune"
        q = np.percentile(cnt, [50, 90, 99, 100])
        print(f"{tag}: leaves/ray mean {cnt.mean():6.2f}  "
              f"p50/p90/p99/max {q[0]:.0f}/{q[1]:.0f}/{q[2]:.0f}/{q[3]:.0f}")
        if not prune:
            hit = hidx[hidx > 0]
            qh = np.percentile(hit, [50, 90, 99, 100]) if len(hit) else []
            print(f"          final-hit emit index p50/p90/p99/max "
                  f"{qh[0]:.0f}/{qh[1]:.0f}/{qh[2]:.0f}/{qh[3]:.0f} "
                  f"(hit {len(hit)}/{R})")
            for K in (8, 12, 16, 24, 32):
                print(f"          K={K:3d}: overflow {(cnt > K).mean():.3f}"
                      f"  pairs/ray capped {np.minimum(cnt, K).mean():.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
