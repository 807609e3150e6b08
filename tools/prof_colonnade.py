#!/usr/bin/env python
"""Where does a colonnade render round spend its time?

Times, on the real chip: (a) a full render round, (b) pure
closest-hit intersection of the camera's primary rays, (c) pure
any-hit (shadow-style) rays from hit points to the light, (d) a
bounce-style batch (origins at hit points, cosine directions).
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rgk_tpu.driver.render import RenderDriver
from rgk_tpu.ops import intersect as isect
from rgk_tpu.scene.config import build_scene, load_config

scene_dir = "/tmp/bigscene_bench"
cfg_path = os.path.join(scene_dir, "colonnade.json")
if not os.path.exists(cfg_path):
    subprocess.run([sys.executable, "tools/make_bigscene.py", "--dir",
                    scene_dir, "--tris", "1000000"], check=True)
cfg = load_config(cfg_path)
s = cfg.settings
s.xres = s.yres = 512
s.multisample = 16
arrays, meta, _ = build_scene(cfg, build_bvh=True)
cam = cfg.get_camera()
driver = RenderDriver(s, arrays, meta, cam, chunk_lanes=1 << 20)

print("depth:", s.recursion_max, "spp:", s.multisample,
      "lanes/chunk:", driver.chunk_lanes)


def timeit(name, fn, *args, reps=3):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:28s}: {dt*1e3:8.1f} ms")
    return r, dt


# (a) full round
_, round_dt = timeit("full render round", lambda: driver.render_round(1)
                     or driver._rays_dev, reps=2)
rays = float(driver._rays_dev)
print(f"  extension rays so far: {rays/1e6:.1f}M")

# (b) primary rays
R = 1 << 20
px = jnp.arange(R, dtype=jnp.int32) % s.xres
py = (jnp.arange(R, dtype=jnp.int32) // s.xres) % s.yres
from rgk_tpu.scene.camera import pixel_rays
ro, rd = pixel_rays(cam, px, py,
                    jnp.zeros((R, 2), jnp.float32),
                    jnp.zeros((R, 2), jnp.float32))
intersect = isect.make_intersector(meta)
scene = driver.scene

f_closest = jax.jit(lambda ro, rd: intersect(scene, ro, rd, 0.0, 1e4).t)
hit_t, dt = timeit("primary closest-hit 1M", f_closest, ro, rd)
print(f"  -> {R/dt/1e6:6.2f} Mrays/s, hit rate "
      f"{(np.asarray(hit_t) < 1e9).mean():.2f}")

# (c) shadow rays: hit points toward the point light
t_clip = jnp.minimum(hit_t, 50.0)
p = ro + t_clip[:, None] * rd
lpos = scene.lights.point_pos[0]
d = lpos[None, :] - p
dist = jnp.linalg.norm(d, axis=-1)
rd_s = d / dist[:, None]
f_any = jax.jit(lambda ro_, rd_, tm: intersect(
    scene, ro_, rd_, 1e-3, tm, any_hit=True).t)
_, dt = timeit("shadow any-hit 1M", f_any, p, rd_s, dist - 1e-3)
print(f"  -> {R/dt/1e6:6.2f} Mrays/s")

# (d) bounce rays: cosine-ish random dirs from hit points
key = jax.random.PRNGKey(0)
v = jax.random.normal(key, (R, 3))
v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
_, dt = timeit("bounce closest-hit 1M", f_closest, p, v)
print(f"  -> {R/dt/1e6:6.2f} Mrays/s")
