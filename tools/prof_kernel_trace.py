#!/usr/bin/env python
"""Profiler trace of ONE cluster-kernel invocation; dumps the op
stats so we can see what the hardware is actually doing (vector vs
scalar vs DMA stall attribution is the goal)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from tools.prof_bvh import make_uv_sphere_obj
from rgk_tpu.io.obj import load_obj
from rgk_tpu.ops.pallas_cluster import intersect_clusters
from rgk_tpu.scene.builder import build_tri_pack
from rgk_tpu.scene.clusters import build_clusters

obj = "/tmp/prof_cluster_sphere.obj"
n = make_uv_sphere_obj(obj, 1_000_000)
meshes, _ = load_obj(obj)
verts, tris = meshes[0].positions, meshes[0].faces
pack = build_tri_pack(verts, tris)


class S:
    pass


scene = S()
scene.clusters = build_clusters(verts, tris, pack)

R = 1 << 18
eye = np.array([0.0, 0.0, 4.0], np.float32)
side = int(np.sqrt(R))
u = (np.arange(side * side) % side) / side - 0.5
v = (np.arange(side * side) // side) / side - 0.5
d = np.stack([u, v, -np.ones_like(u)], axis=1)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro = jnp.asarray(np.broadcast_to(eye, d.shape).astype(np.float32))
rd = jnp.asarray(d.astype(np.float32))

fn = jax.jit(lambda ro, rd: intersect_clusters(
    scene, ro, rd, 0.0, 1e4, block=1024, sort_rays=False).t)
r = jax.block_until_ready(fn(ro, rd))

logdir = "/tmp/jaxtrace_k"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
r = jax.block_until_ready(fn(ro, rd))
jax.profiler.stop_trace()

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

for tool in ("framework_op_stats", "op_profile"):
    try:
        data, _ = rttd.xspace_to_tool_data(paths, tool, {})
        out = data.decode() if isinstance(data, bytes) else data
        fn_out = f"/tmp/kernel_{tool}.txt"
        with open(fn_out, "w") as f:
            f.write(out if isinstance(out, str) else str(out))
        print(f"=== {tool} (first 2500 chars) ===")
        print(str(out)[:2500])
    except Exception as e:
        print(tool, "failed:", e)
