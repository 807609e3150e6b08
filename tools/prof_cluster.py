#!/usr/bin/env python
"""Microbenchmark the cluster-BVH kernel: coherent vs incoherent rays.

Builds a dense sphere soup, then times intersect_clusters on
(a) camera-style primary rays (coherent blocks),
(b) uniformly random rays (worst-case divergent blocks),
(c) random rays sorted by direction octant + origin morton key.

Usage: python tools/prof_cluster.py [--tris 200000] [--rays 1048576]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized coords -> 30-bit morton code."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def sort_key(ro, rd):
    octant = ((rd[:, 0] >= 0).astype(np.uint64)
              | ((rd[:, 1] >= 0).astype(np.uint64) << np.uint64(1))
              | ((rd[:, 2] >= 0).astype(np.uint64) << np.uint64(2)))
    lo = ro.min(axis=0)
    hi = ro.max(axis=0)
    q = ((ro - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.uint32)
    return (octant << np.uint64(30)) | morton3(q)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200_000)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--block", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tools.prof_bvh import make_uv_sphere_obj
    from rgk_tpu.io.obj import load_obj
    from rgk_tpu.ops.pallas_cluster import intersect_clusters
    from rgk_tpu.scene.builder import build_tri_pack
    from rgk_tpu.scene.clusters import build_clusters

    obj = "/tmp/prof_cluster_sphere.obj"
    n = make_uv_sphere_obj(obj, args.tris)
    meshes, _ = load_obj(obj)
    verts, tris = meshes[0].positions, meshes[0].faces
    t0 = time.time()
    pack = build_tri_pack(verts, tris)

    class S:
        pass
    scene = S()
    scene.clusters = build_clusters(verts, tris, pack)
    print(f"{n} tris, {scene.clusters.boxes_q.shape[0] // 3} cluster nodes, "
          f"build {time.time()-t0:.2f}s")

    R = args.rays
    rng = np.random.default_rng(0)

    # (a) primary-style: rays from one eye point toward sphere, in
    # image scan order (coherent blocks).
    eye = np.array([0.0, 0.0, 4.0], np.float32)
    side = int(np.sqrt(R))
    u = (np.arange(side * side) % side) / side - 0.5
    v = (np.arange(side * side) // side) / side - 0.5
    d = np.stack([u, v, -np.ones_like(u)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro_a = np.broadcast_to(eye, d.shape).astype(np.float32)
    rd_a = d.astype(np.float32)

    # (b) random: origins in shell, random dirs.
    ro_b = rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32)
    rd_b = rng.normal(size=(R, 3)).astype(np.float32)
    rd_b /= np.linalg.norm(rd_b, axis=1, keepdims=True)

    # (c) = (b) sorted.
    key = sort_key(ro_b, rd_b)
    perm = np.argsort(key)
    ro_c, rd_c = ro_b[perm], rd_b[perm]

    fn = jax.jit(lambda ro, rd: intersect_clusters(
        scene, ro, rd, 0.0, 1e4, block=args.block).t)

    for name, ro, rd in (("coherent", ro_a, rd_a),
                         ("random", ro_b, rd_b),
                         ("sorted", ro_c, rd_c)):
        ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
        r = jax.block_until_ready(fn(ro_j, rd_j))  # compile+warm
        t0 = time.time()
        for _ in range(args.reps):
            r = jax.block_until_ready(fn(ro_j, rd_j))
        dt = (time.time() - t0) / args.reps
        hits = float((np.asarray(r) < 1e9).mean())
        print(f"{name:9s}: {ro.shape[0]/dt/1e6:8.2f} Mrays/s "
              f"({dt*1e3:.1f} ms, hit rate {hits:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
