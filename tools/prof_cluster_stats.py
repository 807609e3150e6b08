#!/usr/bin/env python
"""Traversal statistics for the cluster kernel: per-block visited
nodes and swept leaves on coherent / random / sorted ray sets.

Usage: python tools/prof_cluster_stats.py [--tris 1000000]
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
    ap.add_argument("--block", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tools.prof_bvh import make_uv_sphere_obj
    from rgk_tpu.io.obj import load_obj
    from rgk_tpu.ops import pallas_cluster as pc
    from rgk_tpu.scene.builder import build_tri_pack
    from rgk_tpu.scene.clusters import build_clusters

    obj = "/tmp/prof_cluster_sphere.obj"
    n = make_uv_sphere_obj(obj, args.tris)
    meshes, _ = load_obj(obj)
    verts, tris = meshes[0].positions, meshes[0].faces
    pack = build_tri_pack(verts, tris)
    cl = build_clusters(verts, tris, pack)
    n_nodes = cl.boxes_q.shape[0] // 3
    n_leaves = int(np.unpackbits(
        np.asarray(cl.leaf_bits).view(np.uint8)).sum())
    print(f"{n} tris, {n_nodes} nodes ({n_leaves} leaves)")

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

    B = args.block
    tmin = jnp.zeros((R,), jnp.float32)
    tmax = jnp.full((R,), 1e4, jnp.float32)
    excl = jnp.full((R,), -1, jnp.int32)

    for name, ro, rd in (("coherent", ro_a, rd_a),
                         ("random", ro_b, rd_b),
                         ("sorted", ro_c, rd_c)):
        out = pc._run(cl.boxes_q, cl.leaf_bits, cl.links, cl.pack,
                      cl.scene_lo, cl.scene_step,
                      jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]),
                      jnp.asarray(ro[:, 2]), jnp.asarray(rd[:, 0]),
                      jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
                      tmin, tmax, excl, cl.half_meta.shape[0], False, B,
                      False, stats=True)
        nodes = np.asarray(out[2]).reshape(-1, B)[:, 0]
        leaves = np.asarray(out[3]).reshape(-1, B)[:, 0]
        print(f"{name:9s}: nodes/blk mean {nodes.mean():8.0f} "
              f"max {nodes.max():6d} | leaves/blk mean "
              f"{leaves.mean():7.0f} max {leaves.max():6d} "
              f"(of {n_leaves})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
