#!/usr/bin/env python
"""Benchmark: wavefront path-tracing throughput on the attached device.

Renders the reference cornell-box scene (analytic geometry, areal
lights, russian roulette — the reference's flagship config) at a fixed
wavefront budget and reports extension-ray throughput in Mrays/s,
matching the reference's own counter semantics (path-extension rays
only, src/path_tracer.cpp:126 / render_driver.cpp:136-137).

Prints ONE JSON line:
    {"metric": "cornell_box_mrays_per_s", "value": N, "unit": "Mrays/s",
     "vs_baseline": N}

vs_baseline compares against the reference C++ renderer's measured CPU
throughput on this class of machine (BASELINE.md; RGKrt could not be
built in this image — no assimp/png++ — so the recorded proxy is our
own measurement target of 10 Mrays/s, a generous estimate for the
multithreaded reference on a 2-vCPU host).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 10.0  # see module docstring


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from rgk_tpu.driver.render import RenderDriver
    from rgk_tpu.scene.config import build_scene, load_config

    cfg = load_config("/root/reference/scenes/cornell-box.json")
    s = cfg.settings
    s.xres = s.yres = 512
    # The reference's flagship config renders this scene at
    # multisample=400; 64 samples per round keeps each timed round
    # ~0.5 s while exercising the same queued-wavefront regime.
    s.multisample = 64
    s.recursion_max = 10

    arrays, meta, _ = build_scene(cfg, build_bvh=True)
    cam = cfg.get_camera()

    driver = RenderDriver(s, arrays, meta, cam, chunk_lanes=1 << 21)
    # Warmup round compiles; timed rounds measure steady state.
    driver.render_round(0)
    jax.block_until_ready(driver._rays_dev)
    rays0 = float(driver._rays_dev)
    t0 = time.time()
    n_rounds = 2
    for r in range(1, 1 + n_rounds):
        driver.render_round(r)
    jax.block_until_ready(driver._rays_dev)
    dt = time.time() - t0
    rays = float(driver._rays_dev) - rays0

    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "cornell_box_mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
