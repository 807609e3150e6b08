#!/usr/bin/env python
"""Where does colonnade e2e time go?  Times one queued round, then the
same round with intersection stubbed to a fixed-t hit (shading-only)
and with shading stubbed (intersection-only est. via kernel microbench
on the round's actual ray mix is impractical — instead we time the
full round and a no-shadow-ray round to split extension vs visibility).

Usage: python tools/prof_e2e.py
"""

from __future__ import annotations

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


def main() -> int:
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_dir = "/tmp/bigscene_bench"
    cfg_path = os.path.join(scene_dir, "colonnade.json")
    if not os.path.exists(cfg_path):
        subprocess.run(
            [sys.executable, os.path.join(here, "tools", "make_bigscene.py"),
             "--dir", scene_dir, "--tris", "1000000"],
            check=True, stdout=subprocess.DEVNULL)

    from rgk_tpu.driver.render import RenderDriver
    from rgk_tpu.scene.config import build_scene, load_config

    cfg = load_config(cfg_path)
    s = cfg.settings
    s.xres = s.yres = 512
    s.multisample = 16
    arrays, meta, _ = build_scene(cfg, build_bvh=True)

    def run(tag, **kw):
        driver = RenderDriver(s, arrays, meta, cfg.get_camera(),
                              chunk_lanes=1 << 20)
        driver.render_round(0)
        jax.block_until_ready(driver._rays_dev)
        r0 = float(driver._rays_dev)
        t0 = time.time()
        driver.render_round(1)
        driver.render_round(2)
        jax.block_until_ready(driver._rays_dev)
        dt = (time.time() - t0) / 2
        mr = (float(driver._rays_dev) - r0) / 2 / dt / 1e6
        print(f"{tag:24s}: {dt:6.2f} s/round, {mr:6.3f} Mrays/s")
        return dt

    full = run("full (NEE)")

    # no shadow rays: visibility patched to always-visible
    from rgk_tpu.ops import intersect as isect
    orig_vis = isect.visibility
    isect.visibility = lambda scene, f, a, b, eps_mult=20.0, active=None: \
        jnp.ones((a.shape[0],), bool)
    try:
        novis = run("no shadow rays")
    finally:
        isect.visibility = orig_vis

    # no sort in the cluster intersector
    from rgk_tpu.ops import pallas_cluster as pc
    orig = pc.intersect_clusters

    def nosort(scene, ro, rd, t_min, t_max, **kw):
        kw["sort_rays"] = False
        return orig(scene, ro, rd, t_min, t_max, **kw)

    pc.intersect_clusters = nosort
    try:
        ns = run("no ray sort")
    finally:
        pc.intersect_clusters = orig

    print(f"shadow-ray share  : {full-novis:6.2f} s/round")
    print(f"sort overhead     : {ns-full:+6.2f} s/round (negative = "
          f"sorting pays for itself)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
