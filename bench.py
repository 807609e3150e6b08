#!/usr/bin/env python
"""Benchmark: wavefront path-tracing throughput on the attached device.

Three regimes, mirroring BASELINE.md:

* cornell-box (reference scenes/cornell-box.json, analytic geometry,
  areal light, RR) — the flat-kernel wavefront regime;
* bdpt_box (tools/bdpt_scene.py, reverse=4) — the bidirectional
  regime (reference box2-class), through the queued BDPT tracer;
* colonnade (tools/make_bigscene.py, ~1M triangles) — the cluster-BVH
  regime standing in for the reference's sponza flagship
  (BASELINE.json configs[3]; the sponza OBJ is not in the repo).

Throughput counts extension rays only, matching the reference's own
counter semantics (reference src/path_tracer.cpp:126,
render_driver.cpp:136-137).

Baselines are the reference renderer's MEASURED CPU throughput:
RGKrt compiled locally from /root/reference/src (tools/refbuild) and
timed by tools/measure_baseline.py on this host class; the numbers are
recorded in tools/baseline_measured.json.

Prints ONE JSON line; the headline metric/vs_baseline is the
large-scene (colonnade) regime, with the cornell numbers as extra
keys:
    {"metric": "colonnade_1m_mrays_per_s", "value": N,
     "unit": "Mrays/s", "vs_baseline": N,
     "cornell_mrays_per_s": N, "cornell_vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# Measured by tools/measure_baseline.py (RGKrt self-reported rays/s;
# see tools/baseline_measured.json for the full record).  Fallback
# constants are that file's values from the 2-vCPU build host.
_FALLBACK_BASELINES = {"cornell_box": 0.5391, "colonnade": 0.0951,
                       "bdpt_box": 0.4487}


def _baselines() -> dict:
    path = os.path.join(HERE, "tools", "baseline_measured.json")
    try:
        with open(path) as f:
            d = json.load(f)
        return {k: d[k]["mrays_per_s"]
                for k in ("cornell_box", "colonnade", "bdpt_box")}
    except Exception:
        return dict(_FALLBACK_BASELINES)


def _measure(driver, n_rounds: int) -> float:
    """Steady-state extension-ray throughput in Mrays/s."""
    import jax

    driver.render_round(0)  # warmup: compiles
    jax.block_until_ready(driver._rays_dev)
    rays0 = float(driver._rays_dev)
    t0 = time.time()
    for r in range(1, 1 + n_rounds):
        driver.render_round(r)
    jax.block_until_ready(driver._rays_dev)
    dt = time.time() - t0
    return (float(driver._rays_dev) - rays0) / dt / 1e6


def bench_cornell() -> float:
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
    driver = RenderDriver(s, arrays, meta, cfg.get_camera(),
                          chunk_lanes=1 << 21)
    return _measure(driver, 2)


def parity_gate(arrays, meta, cfg) -> float:
    """Pixel-correctness gate behind every colonnade BENCH number:
    render a small frame through the TPU CLUSTER kernel and through
    the host-CPU BVH path at identical (seed, pixel, sample), and
    require the images to agree.  A traversal bug that biased hits
    would pass throughput benches but fail here (oracle pairing in
    the spirit of comparing against the reference's own EXR output,
    reference src/texture.cpp:356-374).

    Gate (all must hold, see the assert below): 1%-trimmed
    correlation > 0.998, full correlation > 0.98, mean relative
    difference < 5%, and no single 8x8 pixel tile may hold more than
    a quarter of the outlier (trimmed-away) pixels — so a localized
    systematic defect cannot hide inside the trimmed 1%.

    Returns the trimmed correlation; raises AssertionError on any
    violated bound."""
    import copy

    import jax
    import numpy as np

    from rgk_tpu.driver.render import RenderDriver

    import dataclasses

    s = copy.deepcopy(cfg.settings)
    s.xres = s.yres = 64
    s.multisample = 4
    s.recursion_max = 3
    cam = dataclasses.replace(cfg.get_camera(), xres=s.xres,
                              yres=s.yres)

    def render(device):
        with jax.default_device(device):
            local = jax.device_put(arrays, device)
            d = RenderDriver(s, local, meta, cam)
            d.render_round(0)
            d.fetch_accumulation()
            return np.asarray(d.acc.sum, np.float64)

    img_tpu = render(jax.devices()[0])
    img_cpu = render(jax.devices("cpu")[0])
    a = img_tpu.ravel()
    b = img_cpu.ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    # Tie-level hit decisions at the high-emission panel edges can
    # flip a handful of samples between the two float pipelines
    # (measured: full corr 0.988@2spp -> 0.998@8spp while the
    # 1%-trimmed corr stays 0.9999 — stochastic, not systematic), so
    # the SYSTEMATIC gate is the trimmed correlation and the full
    # correlation only bounds the outlier mass.
    d = np.abs(a - b)
    keep = np.argsort(d)[:int(len(d) * 0.99)]
    corr_trim = float(np.corrcoef(a[keep], b[keep])[0, 1])
    rel = float(d.mean() / max(b.mean(), 1e-9))
    # Spatial-clustering bound on the trimmed outliers: stochastic
    # tie flips scatter across the frame; a systematic traversal bug
    # confined to one region concentrates there.
    out_idx = np.argsort(d)[int(len(d) * 0.99):]
    h, w, _ = img_tpu.shape
    pix = np.unique(out_idx // 3)
    tiles = (pix // w // 8) * ((w + 7) // 8) + (pix % w) // 8
    max_tile = int(np.bincount(tiles).max()) if len(tiles) else 0
    tile_cap = max(8, len(pix) // 4)
    assert (corr_trim > 0.998 and corr > 0.98 and rel < 0.05
            and max_tile <= tile_cap), (
        f"cluster-kernel image parity FAILED: corr={corr:.4f} "
        f"trimmed={corr_trim:.4f} mean-rel-diff={rel:.4f} "
        f"max-outliers-per-8x8-tile={max_tile} (cap {tile_cap})")
    return corr_trim


def bench_colonnade() -> tuple[float, float, float]:
    from rgk_tpu.driver.render import RenderDriver
    from rgk_tpu.scene.config import build_scene, load_config

    scene_dir = "/tmp/bigscene_bench"
    cfg_path = os.path.join(scene_dir, "colonnade.json")
    if not os.path.exists(cfg_path):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "make_bigscene.py"),
             "--dir", scene_dir, "--tris", "1000000"],
            check=True, stdout=subprocess.DEVNULL)
    cfg = load_config(cfg_path)
    s = cfg.settings
    s.xres = s.yres = 512
    s.multisample = 16
    t0 = time.time()
    arrays, meta, _ = build_scene(cfg, build_bvh=True)
    commit_s = time.time() - t0  # native binned-SAH + cluster/link build
    corr = parity_gate(arrays, meta, cfg)
    driver = RenderDriver(s, arrays, meta, cfg.get_camera(),
                          chunk_lanes=1 << 20)
    return _measure(driver, 2), commit_s, corr


def bench_bdpt() -> float:
    """Bidirectional regime (reverse=4): the shared box2-class scene
    (tools/bdpt_scene.py — the identical JSON RGKrt renders for the
    baseline in tools/measure_baseline.py), driven through the queued
    BDPT tracer.  Throughput keeps the reference's extension-ray
    counter semantics (light + eye subpath extensions)."""
    import json as _json

    from rgk_tpu.driver.render import RenderDriver
    from rgk_tpu.scene.config import build_scene, load_config

    sys.path.insert(0, os.path.join(HERE, "tools"))
    from bdpt_scene import scene_dict

    d = "/tmp/bdpt_bench"
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "bdpt_box.json")
    with open(p, "w") as f:
        _json.dump(scene_dict(res=512, ms=16), f)
    cfg = load_config(p)
    arrays, meta, _ = build_scene(cfg, build_bvh=False)
    driver = RenderDriver(cfg.settings, arrays, meta, cfg.get_camera(),
                          chunk_lanes=1 << 21)
    return _measure(driver, 2)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    base = _baselines()
    cornell = bench_cornell()
    bdpt = bench_bdpt()
    colonnade, commit_s, parity = bench_colonnade()

    print(json.dumps({
        "metric": "colonnade_1m_mrays_per_s",
        "value": round(colonnade, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(colonnade / base["colonnade"], 3),
        "cornell_mrays_per_s": round(cornell, 3),
        "cornell_vs_baseline": round(cornell / base["cornell_box"], 3),
        "bdpt_mrays_per_s": round(bdpt, 3),
        "bdpt_vs_baseline": round(bdpt / base["bdpt_box"], 3),
        "colonnade_commit_s": round(commit_s, 2),
        # TPU-cluster-kernel vs host-CPU-BVH image correlation at
        # identical (seed, pixel, sample) — the pixel gate behind the
        # throughput number (bench aborts unless trimmed corr > 0.998,
        # full corr > 0.98, mean-rel-diff < 5%, outliers unclustered;
        # see parity_gate).
        "colonnade_tpu_cpu_parity": round(parity, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
