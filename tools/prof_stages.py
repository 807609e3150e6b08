"""Stage timing: pure intersection throughput vs full render throughput."""
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
from rgk_tpu.ops import intersect as isect
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
ro = jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32)
rd = jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32)
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

intersect = isect.make_intersector(meta)

@jax.jit
def pure_isect(scene, ro, rd):
    h = intersect(scene, ro, rd, 0.0, 1e4)
    return h.t.sum(), h.tri.sum()

# warmup
r = pure_isect(arrays, ro, rd); jax.block_until_ready(r)
t0 = time.time(); N = 10
for _ in range(N):
    r = pure_isect(arrays, ro, rd)
jax.block_until_ready(r)
dt = (time.time() - t0) / N
print(f"pure intersect: {R/dt/1e6:.1f} M isects/s  ({dt*1e3:.1f} ms per {R} lanes)")

# Full render lanes
px = jnp.asarray(rng.randint(0, 512, R), jnp.int32)
py = jnp.asarray(rng.randint(0, 512, R), jnp.int32)
sidx = jnp.arange(R, dtype=jnp.uint32)

@jax.jit
def full(scene, px, py, sidx):
    res = render_lanes(scene, meta, s, cam, px, py, sidx, jnp.uint32(42))
    return res.radiance.sum(), res.rays

r = full(arrays, px, py, sidx); jax.block_until_ready(r)
t0 = time.time(); N = 5
for _ in range(N):
    r = full(arrays, px, py, sidx)
jax.block_until_ready(r)
dt = (time.time() - t0) / N
rays = int(r[1])
print(f"full render: {rays/dt/1e6:.1f} Mrays/s  ({dt*1e3:.1f} ms per {R} lanes, {rays} ext rays, {rays/R:.2f} rays/lane)")
