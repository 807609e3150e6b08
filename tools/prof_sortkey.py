#!/usr/bin/env python
"""A/B the coherence sort key on divergent (bounce-like) rays.

Candidates, applied to the same random ray set on the 1M-tri sphere
and to a bounce-like set (origins on the surface, cosine dirs):
  A octant-major (current):  octant(3) | origin-morton(15) | dir(12)
  B origin-major:            origin-morton(15) | octant(3) | dir(12)
  C origin-fine:             origin-morton(24) | octant(3)
  D dir-major:               octant(3) | dir(12) | origin(15)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def morton3(q, bits):
    out = np.zeros(len(q), np.uint64)
    for b in range(bits):
        for a in range(3):
            out |= ((q[:, a].astype(np.uint64) >> b) & 1) << (3 * b + a)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

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

    class S:
        pass
    scene = S()
    scene.clusters = cl
    scene.tri_pack = jnp.asarray(pack)

    R = args.rays
    rng = np.random.default_rng(0)
    # random interior rays
    ro_r = rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32)
    rd_r = rng.normal(size=(R, 3)).astype(np.float32)
    rd_r /= np.linalg.norm(rd_r, axis=1, keepdims=True)
    # bounce-like: origins ON the sphere surface, cosine-ish dirs
    p = rng.normal(size=(R, 3)).astype(np.float32)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    nrm = -p  # inward normal
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = (d * nrm).sum(1) < 0
    d[flip] -= 2 * (d[flip] * nrm[flip]).sum(1, keepdims=True) * nrm[flip]
    ro_b = (p * 0.999).astype(np.float32)
    rd_b = d

    def keys(ro, rd):
        lo = ro.min(axis=0)
        hi = ro.max(axis=0)
        q5 = np.clip((ro - lo) / np.maximum(hi - lo, 1e-9) * 31, 0,
                     31).astype(np.uint32)
        q8 = np.clip((ro - lo) / np.maximum(hi - lo, 1e-9) * 255, 0,
                     255).astype(np.uint32)
        qd = np.clip((rd + 1) * 7.5, 0, 15).astype(np.uint32)
        octant = ((rd[:, 0] < 0).astype(np.uint64)
                  + 2 * (rd[:, 1] < 0).astype(np.uint64)
                  + 4 * (rd[:, 2] < 0).astype(np.uint64))
        mo5 = morton3(q5, 5)
        mo8 = morton3(q8, 8)
        md = morton3(qd, 4)
        return {
            "A oct|org15|dir": (octant << np.uint64(27))
            | (mo5 << np.uint64(12)) | md,
            "B org15|oct|dir": (mo5 << np.uint64(15))
            | (octant << np.uint64(12)) | md,
            "C org24|oct": (mo8 << np.uint64(3)) | octant,
            "D oct|dir|org15": (octant << np.uint64(27))
            | (md << np.uint64(15)) | mo5,
        }

    B = args.block
    fn = jax.jit(lambda ro, rd: pc.intersect_clusters(
        scene, ro, rd, 0.0, 1e4, block=B, sort_rays=False).t)

    for name, ro, rd in (("random", ro_r, rd_r), ("bounce", ro_b, rd_b)):
        for kname, k in keys(ro, rd).items():
            perm = np.argsort(k)
            ro_j = jnp.asarray(ro[perm])
            rd_j = jnp.asarray(rd[perm])
            r = jax.block_until_ready(fn(ro_j, rd_j))
            t0 = time.time()
            for _ in range(args.reps):
                r = jax.block_until_ready(fn(ro_j, rd_j))
            dt = (time.time() - t0) / args.reps
            print(f"{name:7s} {kname:16s}: {R/dt/1e6:6.2f} Mrays/s",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
