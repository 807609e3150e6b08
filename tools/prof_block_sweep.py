#!/usr/bin/env python
"""Block-size sweep for the cluster kernel: throughput + traversal
stats (visited nodes, swept leaves) at block 128/256/512/1024.

The round-4 question: how much of the leaf-sweep redundancy (a block
sweeps the union of its lanes' leaves) disappears at smaller blocks,
and whether node-step/DMA overheads eat the gain.

Usage: python tools/prof_block_sweep.py [--tris 1000000] [--rays N]
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
    ap.add_argument("--blocks", type=str, default="1024,512,256,128")
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
    n_nodes = np.asarray(cl.boxes_q).shape[0] // 3
    n_leaves = int(np.unpackbits(
        np.asarray(cl.leaf_bits).view(np.uint8)).sum())
    ch = cl.half_meta.shape[0]
    print(f"{n} tris, {n_nodes} nodes ({n_leaves} leaves, "
          f"chunk={ch * 64} tris)")

    import jax.numpy as _jnp

    class S:
        pass
    scene = S()
    scene.clusters = cl
    scene.tri_pack = _jnp.asarray(pack)

    R = args.rays
    rng = np.random.default_rng(0)
    eye = np.array([0.0, 0.0, 4.0], np.float32)
    side = int(np.sqrt(R))
    u = (np.arange(side * side) % side) / side - 0.5
    v = (np.arange(side * side) // side) / side - 0.5
    d = np.stack([u, v, -np.ones_like(u)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro_a = np.broadcast_to(eye, d.shape).astype(np.float32).copy()
    rd_a = d.astype(np.float32)
    ro_b = rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32)
    rd_b = rng.normal(size=(R, 3)).astype(np.float32)
    rd_b /= np.linalg.norm(rd_b, axis=1, keepdims=True)
    key = sort_key(ro_b, rd_b)
    perm = np.argsort(key)
    ro_c, rd_c = ro_b[perm], rd_b[perm]
    # Shadow fan: rays from one point (a "light") toward sphere points.
    tgt = rng.normal(size=(R, 3)).astype(np.float32)
    tgt /= np.linalg.norm(tgt, axis=1, keepdims=True)
    lp = np.array([2.5, 2.5, 2.5], np.float32)
    ro_d = np.broadcast_to(lp, (R, 3)).astype(np.float32).copy()
    rd_d = tgt - lp
    rd_d /= np.linalg.norm(rd_d, axis=1, keepdims=True)
    kd = sort_key(ro_d, rd_d)
    pd_ = np.argsort(kd)
    ro_d, rd_d = ro_d[pd_], rd_d[pd_]

    sets = (("coherent", ro_a, rd_a), ("sorted-rnd", ro_c, rd_c),
            ("shadowfan", ro_d, rd_d))

    for B in (int(b) for b in args.blocks.split(",")):
        tmin = jnp.zeros((R,), jnp.float32)
        tmax = jnp.full((R,), 1e4, jnp.float32)
        excl = jnp.full((R,), -1, jnp.int32)

        fn = jax.jit(lambda ro, rd, B=B: pc.intersect_clusters(
            scene, ro, rd, 0.0, 1e4, block=B, sort_rays=False).t)

        for name, ro, rd in sets:
            ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)
            r = jax.block_until_ready(fn(ro_j, rd_j))
            t0 = time.time()
            for _ in range(args.reps):
                r = jax.block_until_ready(fn(ro_j, rd_j))
            dt = (time.time() - t0) / args.reps
            # stats pass (interpretless, stats=True)
            out = pc._run(cl.boxes_q, cl.leaf_bits, cl.links, cl.pack,
                          cl.scene_lo, cl.scene_step,
                          jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]),
                          jnp.asarray(ro[:, 2]), jnp.asarray(rd[:, 0]),
                          jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]),
                          tmin, tmax, excl, ch, False, B, False,
                          stats=True)
            nodes = np.asarray(out[2]).reshape(-1, B)[:, 0]
            leaves = np.asarray(out[3]).reshape(-1, B)[:, 0]
            print(f"B={B:5d} {name:10s}: {R/dt/1e6:7.2f} Mrays/s | "
                  f"nodes/blk {nodes.mean():6.0f} | leaves/blk "
                  f"{leaves.mean():6.1f} | leaf-sweep tri-tests/ray "
                  f"{leaves.mean()*ch*64*B/B:8.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
