#!/usr/bin/env python
"""Stage-by-stage timing of the colonnade scene commit.

Answers "where do the 34 s go" (VERDICT r3 weak #2): config parse/obj
load, tri pack, the leaf-4 BVH build, the cluster build (level-1 SAH,
chop, level-2, pack reorder, octant links), and device upload.

Usage: python tools/prof_commit.py [--tris 1000000]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class T:
    def __init__(self):
        self.t0 = time.time()

    def lap(self, name):
        t = time.time()
        print(f"{name:28s} {t - self.t0:7.2f}s")
        self.t0 = t


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_dir = "/tmp/bigscene_bench"
    cfg_path = os.path.join(scene_dir, "colonnade.json")
    if not os.path.exists(cfg_path):
        subprocess.run(
            [sys.executable, os.path.join(here, "tools", "make_bigscene.py"),
             "--dir", scene_dir, "--tris", str(args.tris)],
            check=True, stdout=subprocess.DEVNULL)

    t = T()
    from rgk_tpu.scene.builder import SceneBuilder
    from rgk_tpu.scene.config import load_config
    cfg = load_config(cfg_path)
    t.lap("load_config")

    b = SceneBuilder()
    cfg.install(b)
    t.lap("install (obj load)")

    vertices = np.concatenate(b.vertices, axis=0)
    tri_vidx = np.concatenate(b.tri_vidx, axis=0)
    tri_mat = np.concatenate(b.tri_mat, axis=0)
    t.lap("concat geometry")

    from rgk_tpu.scene.builder import append_thinglass_column, build_tri_pack
    pack = build_tri_pack(vertices, tri_vidx)
    t.lap("build_tri_pack")
    pack_glass = append_thinglass_column(
        pack, tri_mat,
        np.asarray([m.is_thinglass for m in b.materials], bool))
    t.lap("thinglass column")

    from rgk_tpu.scene.bvh import build_bvh
    bvh = build_bvh(vertices, tri_vidx, leaf_size=4)
    t.lap("build_bvh leaf4")

    # cluster build, staged
    from rgk_tpu.scene.bvh import _load_native_builder, _build_numpy
    a = vertices[tri_vidx[:, 0]]
    bb = vertices[tri_vidx[:, 1]]
    c = vertices[tri_vidx[:, 2]]
    prim_min = np.minimum(np.minimum(a, bb), c)
    prim_max = np.maximum(np.maximum(a, bb), c)
    centroids = (prim_min + prim_max) * 0.5
    t.lap("cluster: prim boxes")

    builder = _load_native_builder()
    build = builder if builder is not None else _build_numpy
    print(f"  (native builder: {builder is not None})")
    _, _, _, _, _, order = build(centroids, prim_min, prim_max, 8)
    t.lap("cluster: level-1 SAH leaf8")

    from rgk_tpu.scene import clusters as cl_mod
    cs = cl_mod.CLUSTER_SIZE
    m = tri_vidx.shape[0]
    k = -(-m // cs) * cs
    order = np.asarray(order, np.int64)
    pmin = prim_min[order]
    pmax = prim_max[order]
    if k - m:
        pmin = np.concatenate([pmin, np.repeat(pmin[-1:], k - m, axis=0)])
        pmax = np.concatenate([pmax, np.repeat(pmin[-1:], k - m, axis=0)])
    n_clusters = k // cs
    cl_min = pmin.reshape(n_clusters, cs, 3).min(axis=1)
    cl_max = pmax.reshape(n_clusters, cs, 3).max(axis=1)
    cl_cent = (cl_min + cl_max) * 0.5
    t.lap("cluster: chop")

    node_min, node_max, first, count, skip, corder = build(
        cl_cent, cl_min, cl_max, 1)
    t.lap("cluster: level-2 SAH")

    rows = np.zeros((k, 16), np.float32)
    rows[:m, :13] = pack_glass[order]
    ids = np.full((k,), -1, np.int32)
    ids[:m] = order.astype(np.int32)
    rows[:, 13] = ids.view(np.float32)
    rows = rows.reshape(n_clusters, cs, 16).transpose(
        0, 2, 1).reshape(n_clusters * 16, cs)
    t.lap("cluster: pack reorder")

    first = np.asarray(first, np.int64).copy()
    count_a = np.asarray(count, np.int64)
    corder = np.asarray(corder, np.int64)
    leaf = count_a > 0
    first[leaf] = corder[first[leaf]]
    links = cl_mod.build_octant_links(first, count_a, skip,
                                      node_min, node_max)
    t.lap("cluster: octant links")

    # full commit for comparison + upload timing
    from rgk_tpu.scene.config import build_scene
    t.t0 = time.time()
    arrays, meta, _ = build_scene(cfg, build_bvh=True)
    t.lap("build_scene (everything)")

    import jax
    jax.block_until_ready(jax.device_put(arrays))
    t.lap("device_put(arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
