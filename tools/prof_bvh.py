#!/usr/bin/env python
"""Profile the BVH intersection path on a large procedural scene.

Generates a dense UV-sphere OBJ (--tris, default ~200k triangles)
inside the cornell box, forcing the BVH intersector
(ops/intersect.intersect_bvh), and measures queued-wavefront render
throughput the same way bench.py does for the flat path.

Usage: python tools/prof_bvh.py [--tris 200000] [--res 256] [--ms 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_uv_sphere_obj(path: str, n_tris: int) -> int:
    """Write a UV sphere with roughly n_tris triangles; returns count."""
    # n_tris ~= 2 * nu * nv
    nv = max(3, int(np.sqrt(n_tris / 4)))
    nu = max(3, n_tris // (2 * nv))
    th = np.linspace(0, np.pi, nv + 1)
    ph = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")     # [nv+1, nu]
    x = np.sin(T) * np.cos(P)
    y = np.cos(T)
    z = np.sin(T) * np.sin(P)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3)

    def vid(i, j):
        return i * nu + (j % nu) + 1  # OBJ is 1-based

    faces = []
    for i in range(nv):
        for j in range(nu):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            if i > 0:
                faces.append((a, b, c))
            if i < nv - 1:
                faces.append((a, c, d))
    with open(path, "w") as f:
        f.write("o densesphere\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a} {b} {c}\n")
    return len(faces)


CONFIG = """{
  "output-file": "prof-bvh.exr",
  "output-width": %(res)d, "output-height": %(res)d,
  "multisample": %(ms)d, "rounds": 1, "russian": 0.74,
  "recursion-max": 10, "clamp": 20.0,
  "camera": {"position": [0, 1, 6.8], "lookat": [0, 1, 0], "fov": 19.5},
  "materials": [
    {"name": "White", "diffuse": [0.725, 0.71, 0.68], "brdf": "diffuse"},
    {"name": "Sphere", "specular": [0.825, 0.61, 0.63],
     "roughness": 0.11, "brdf": "ltc_ggx"},
    {"name": "Light", "emission": [17, 12, 4], "brdf": "diffuse"}
  ],
  "scene": [
    {"primitive": "plane", "axis": "Z", "translate": [0,1,-1],
     "material": "White"},
    {"primitive": "plane", "axis": "Y", "material": "White"},
    {"primitive": "plane", "axis": "Y", "translate": [0,2,0],
     "rotate": [180,0,0], "material": "White"},
    {"file": "%(obj)s", "translate": [0, 1.0, 0], "scale": 0.6,
     "material": "Sphere"},
    {"primitive": "plane", "axis": "Y", "translate": [0, 1.98, 0],
     "rotate": [180,0,0], "scale": 0.2, "material": "Light"}
  ]
}
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ms", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--chunk-lanes", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rgk_tpu.driver.render import RenderDriver
    from rgk_tpu.scene.config import build_scene, load_config

    tmp = tempfile.mkdtemp(prefix="prof_bvh_")
    obj_path = os.path.join(tmp, "sphere.obj")
    n = make_uv_sphere_obj(obj_path, args.tris)
    cfg_path = os.path.join(tmp, "scene.json")
    with open(cfg_path, "w") as f:
        f.write(CONFIG % dict(res=args.res, ms=args.ms, obj=obj_path))

    t0 = time.time()
    cfg = load_config(cfg_path)
    arrays, meta, _ = build_scene(cfg, build_bvh=True)
    print(f"scene: {n} sphere tris, has_bvh={meta.has_bvh}, "
          f"build {time.time()-t0:.2f}s")
    cam = cfg.get_camera()

    driver = RenderDriver(cfg.settings, arrays, meta, cam,
                          chunk_lanes=args.chunk_lanes)
    t0 = time.time()
    driver.render_round(0)
    jax.block_until_ready(driver._rays_dev)
    print(f"warmup (compile + run): {time.time()-t0:.1f}s")
    rays0 = float(driver._rays_dev)
    t0 = time.time()
    for r in range(1, 1 + args.rounds):
        driver.render_round(r)
    jax.block_until_ready(driver._rays_dev)
    dt = time.time() - t0
    rays = float(driver._rays_dev) - rays0
    print(json.dumps({"metric": "bvh_sphere_mrays_per_s",
                      "tris": int(n),
                      "value": round(rays / dt / 1e6, 3),
                      "unit": "Mrays/s"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
