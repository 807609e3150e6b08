#!/usr/bin/env python
"""Compare intersect_bvh (per-lane gather traversal, pure JAX) against
the cluster kernel on TPU at scale: coherent / random / sorted rays.

Usage: python tools/prof_lane_bvh.py [--tris 1000000] [--rays 262144]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prof_cluster import sort_key  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--leaf", type=int, default=4)
    ap.add_argument("--which", default="lane",
                    choices=("lane", "cluster", "both"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tools.prof_bvh import make_uv_sphere_obj
    from rgk_tpu.io.obj import load_obj
    from rgk_tpu.ops.intersect import intersect_bvh
    from rgk_tpu.scene.builder import build_tri_pack
    from rgk_tpu.scene.bvh import build_bvh
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
    scene.bvh = build_bvh(verts, tris, leaf_size=args.leaf)
    scene.tri_pack = jnp.asarray(pack)
    scene.clusters = build_clusters(verts, tris, pack)
    print(f"{n} tris, {scene.bvh.node_meta.shape[0]} bvh nodes, "
          f"build {time.time()-t0:.2f}s")

    R = args.rays
    rng = np.random.default_rng(0)

    eye = np.array([0.0, 0.0, 4.0], np.float32)
    side = int(np.sqrt(R))
    u = (np.arange(side * side) % side) / side - 0.5
    v = (np.arange(side * side) // side) / side - 0.5
    d = np.stack([u, v, -np.ones_like(u)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro_a = np.broadcast_to(eye, d.shape).astype(np.float32)
    rd_a = d.astype(np.float32)

    ro_b = rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32)
    rd_b = rng.normal(size=(R, 3)).astype(np.float32)
    rd_b /= np.linalg.norm(rd_b, axis=1, keepdims=True)

    key = sort_key(ro_b, rd_b)
    perm = np.argsort(key)
    ro_c, rd_c = ro_b[perm], rd_b[perm]

    fns = {}
    if args.which in ("lane", "both"):
        fns["lane"] = jax.jit(lambda ro, rd: intersect_bvh(
            scene, ro, rd, 0.0, 1e4, leaf_size=args.leaf).t)
    if args.which in ("cluster", "both"):
        from rgk_tpu.ops.pallas_cluster import intersect_clusters
        fns["cluster"] = jax.jit(lambda ro, rd: intersect_clusters(
            scene, ro, rd, 0.0, 1e4).t)

    for fname, fn in fns.items():
        for name, ro, rd in (("coherent", ro_a, rd_a),
                             ("random", ro_b, rd_b),
                             ("sorted", ro_c, rd_c)):
            ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
            r = jax.block_until_ready(fn(ro_j, rd_j))
            t0 = time.time()
            for _ in range(args.reps):
                r = jax.block_until_ready(fn(ro_j, rd_j))
            dt = (time.time() - t0) / args.reps
            hits = float((np.asarray(r) < 1e9).mean())
            print(f"{fname:8s} {name:9s}: {ro.shape[0]/dt/1e6:8.2f} "
                  f"Mrays/s ({dt*1e3:.1f} ms, hit rate {hits:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
