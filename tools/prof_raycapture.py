#!/usr/bin/env python
"""Capture the REAL ray sets the colonnade round feeds the cluster
kernel (closest + any-hit calls), then measure per-call kernel
throughput + traversal-union stats on exactly those rays.

The synthetic proxies (sorted-rnd / shadowfan in prof_block_sweep)
bound the design space, but the binned-traversal decision needs the
actual e2e mix: camera bundles, queued-regeneration bounce rays, and
NEE shadow rays after the coherence sort.  The wavefront is jitted,
so the capture rides an io_callback inside intersect_clusters.

Usage: python tools/prof_raycapture.py [--max-calls 12] [--measure]

Caveat: over the tunneled axon backend in this image, io_callback
inside the jitted round hits a TPU backend setup/compile error — run
the capture phase on a CPU-mesh host (JAX_PLATFORMS=cpu) and the
measure phase on the chip.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CAPDIR = "/tmp/raycapture"


def capture_phase(args) -> None:
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
    from rgk_tpu.ops import pallas_cluster as pc

    cfg = load_config(cfg_path)
    s = cfg.settings
    s.xres = s.yres = 512
    s.multisample = 16
    arrays, meta, _ = build_scene(cfg, build_bvh=True)

    os.makedirs(CAPDIR, exist_ok=True)
    state = dict(n=0)

    def dump(ro, rd, tmin, tmax, excl, any_hit):
        i = state["n"]
        state["n"] += 1
        if i < args.max_calls:
            np.savez(os.path.join(CAPDIR, f"call{i:03d}.npz"),
                     ro=ro, rd=rd, tmin=tmin, tmax=tmax, excl=excl,
                     any_hit=np.asarray(any_hit))
            print(f"  captured call {i} any_hit={bool(any_hit)} "
                  f"R={ro.shape[0]}")

    orig = pc.intersect_clusters

    def wrapped(scene, ro, rd, t_min, t_max, exclude=None,
                any_hit=False, **kw):
        R = ro.shape[0]
        tmin_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
        tmax_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
        excl_b = exclude if exclude is not None \
            else jnp.full((R,), -1, jnp.int32)
        jax.experimental.io_callback(
            dump, None, ro, rd, tmin_b, tmax_b, excl_b,
            jnp.asarray(any_hit), ordered=True)
        return orig(scene, ro, rd, t_min, t_max, exclude=exclude,
                    any_hit=any_hit, **kw)

    pc.intersect_clusters = wrapped
    try:
        driver = RenderDriver(s, arrays, meta, cfg.get_camera(),
                              chunk_lanes=1 << 20)
        driver.render_round(0)
        jax.block_until_ready(driver._rays_dev)
    finally:
        pc.intersect_clusters = orig
    print(f"total calls in round: {state['n']}")


def measure_phase(args) -> None:
    from tools.prof_bvh import make_uv_sphere_obj  # noqa: F401
    from rgk_tpu.scene.config import build_scene, load_config
    from rgk_tpu.ops import pallas_cluster as pc

    cfg = load_config("/tmp/bigscene_bench/colonnade.json")
    s = cfg.settings
    arrays, meta, _ = build_scene(cfg, build_bvh=True)
    cl = arrays.clusters
    ch = cl.half_meta.shape[0]

    files = sorted(os.listdir(CAPDIR))
    B = args.block
    for f in files:
        d = np.load(os.path.join(CAPDIR, f))
        ro, rd = d["ro"], d["rd"]
        tmin, tmax, excl = d["tmin"], d["tmax"], d["excl"]
        anyh = bool(d["any_hit"])
        R = ro.shape[0]
        live = (tmax > tmin)
        # throughput of the real call (sorted path, as e2e runs it)
        fn = jax.jit(lambda ro, rd, a, b, e: pc.intersect_clusters(
            arrays, ro, rd, a, b, exclude=e, any_hit=anyh, block=B).t)
        ja = [jnp.asarray(x) for x in (ro, rd, tmin, tmax, excl)]
        r = jax.block_until_ready(fn(*ja))
        t0 = time.time()
        for _ in range(2):
            r = fn(*ja)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / 2
        # union stats on the SORTED rays (mirror intersect_clusters)
        key = np.asarray(jnp.where(
            ja[3] <= ja[2], jnp.int32(0x7FFFFFFF),
            pc._ray_sort_key(cl, ja[0], ja[1])))
        perm = np.argsort(key)
        Rp = -(-R // B) * B
        pad = Rp - R

        def padf(a, v=0.0):
            return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                          constant_values=v)
        ros, rds = padf(ro[perm]), padf(rd[perm])
        tmins = padf(tmin[perm], 3.4e38)
        tmaxs = padf(tmax[perm], -3.4e38)
        excls = padf(excl[perm])
        out = pc._run(cl.boxes_q, cl.leaf_bits, cl.links, cl.pack,
                      cl.scene_lo, cl.scene_step,
                      jnp.asarray(ros[:, 0]), jnp.asarray(ros[:, 1]),
                      jnp.asarray(ros[:, 2]), jnp.asarray(rds[:, 0]),
                      jnp.asarray(rds[:, 1]), jnp.asarray(rds[:, 2]),
                      jnp.asarray(tmins), jnp.asarray(tmaxs),
                      jnp.asarray(excls), ch, anyh, B, False, stats=True)
        nodes = np.asarray(out[2]).reshape(-1, B)[:, 0]
        leaves = np.asarray(out[3]).reshape(-1, B)[:, 0]
        nlive = int(live.sum())
        print(f"{f} any={int(anyh)} R={R} live={nlive/R:5.1%} "
              f"{nlive/dt/1e6:7.2f} Mliverays/s ({dt*1e3:6.1f} ms) | "
              f"nodes/blk mean {nodes.mean():7.1f} p90 "
              f"{np.percentile(nodes, 90):7.1f} | leaves/blk mean "
              f"{leaves.mean():6.1f} p90 {np.percentile(leaves, 90):6.1f}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-calls", type=int, default=12)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--capture", action="store_true")
    args = ap.parse_args()
    if args.capture or not os.path.isdir(CAPDIR):
        capture_phase(args)
    if args.measure:
        measure_phase(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
