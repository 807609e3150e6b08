"""Capture a jax profiler trace of one full render dispatch and print
the top ops by self time (parsed from the xplane protobuf)."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rgk_tpu.scene.config import build_scene, load_config
from rgk_tpu.integrator.path import render_lanes

cfg = load_config("/root/reference/scenes/cornell-box.json")
s = cfg.settings
s.xres = s.yres = 512
s.multisample = 8
s.recursion_max = 10
arrays, meta, _ = build_scene(cfg, build_bvh=True)
cam = cfg.get_camera()

R = 1 << 21
rng = np.random.RandomState(0)
px = jnp.asarray(rng.randint(0, 512, R), jnp.int32)
py = jnp.asarray(rng.randint(0, 512, R), jnp.int32)
sidx = jnp.arange(R, dtype=jnp.uint32)


@jax.jit
def full(scene, px, py, sidx):
    res = render_lanes(scene, meta, s, cam, px, py, sidx, jnp.uint32(42))
    return res.radiance.sum(), res.rays

r = full(arrays, px, py, sidx)
jax.block_until_ready(r)

logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
r = full(arrays, px, py, sidx)
jax.block_until_ready(r)
jax.profiler.stop_trace()

# Parse xplane
paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

data, _ = rttd.xspace_to_tool_data(paths, "framework_op_stats", {})
import csv
import io

# data is csv-ish? try json
out = data.decode() if isinstance(data, bytes) else data
with open("/tmp/opstats.txt", "w") as f:
    f.write(out)
print(out[:3000])
