"""Progressive render driver: rounds/timed loop, chunking, progress.

The TPU-native counterpart of the reference's RenderDriver (reference
src/render_driver.cpp): where the reference fans 32x32 tiles over a
thread pool, we launch jit-compiled wavefront chunks over the device
(or device mesh, see parallel/), accumulate radiance sums + sample
counts per pixel, and rewrite the output EXR after every round so a
killed render keeps its last round (render_driver.cpp:227-248).

Chunking: one jitted function of fixed lane count renders any subset
of (pixel, sample) lanes; large frames iterate over pixel blocks so
compilation happens exactly once per shape.  Seeds derive from
(base_seed, round) — deterministic and restartable from a round index
(the checkpoint/resume story: sum, count, round, seed).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..integrator.path import render_lanes
from ..io.exr import AccumulationImage
from ..ops import sampler as smp
from ..utils import log as out
from ..utils.format import LowPass, format_int_thousands, format_time


@dataclass
class RenderStats:
    rounds: int = 0
    rays: int = 0
    lanes: int = 0
    seconds: float = 0.0

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.seconds if self.seconds > 0 else 0.0


class RenderDriver:
    """Drives progressive rendering of one frame."""

    def __init__(self, settings, scene, meta, camera, seed: int = 42,
                 sampler_mode: int = 1, chunk_lanes: int = 1 << 20,
                 mesh=None):
        self.settings = settings
        self.scene = scene
        self.meta = meta
        self.camera = camera
        self.seed = seed
        self.sampler_mode = sampler_mode
        self.chunk_lanes = int(chunk_lanes)
        self.mesh = mesh  # optional parallel.MeshContext

        xres, yres = camera.xres, camera.yres
        self.acc = AccumulationImage(xres, yres)
        self.stats = RenderStats()

        # Pixel-block decomposition: ms samples per pixel per round;
        # a chunk holds `block` pixels x ms lanes.
        ms = max(1, int(settings.multisample))
        self.ms = ms
        block = max(1, self.chunk_lanes // ms)
        n_pixels = xres * yres
        self.block = min(block, n_pixels)
        if mesh is not None and self.block % mesh.n:
            # Lane counts must divide the mesh; round the block up.
            self.block += mesh.n - self.block % mesh.n
        self.n_blocks = (n_pixels + self.block - 1) // self.block

        if mesh is not None:
            self.scene = mesh.shard_scene(scene)
            self._render_fn = mesh.make_render_fn(meta, settings, sampler_mode)
        else:
            self._render_fn = jax.jit(partial(
                render_lanes, meta=self.meta, settings=self.settings,
                sampler_mode=self.sampler_mode), donate_argnames=())

        # Flat pixel coordinates, padded to whole blocks (padding lanes
        # re-render pixel 0 and are dropped on accumulation).
        pix = np.arange(self.n_blocks * self.block, dtype=np.int64)
        self._pad_mask = pix < n_pixels
        pix = np.where(self._pad_mask, pix, 0)
        self._px = (pix % xres).astype(np.int32)
        self._py = (pix // xres).astype(np.int32)

    def render_round(self, round_idx: int) -> None:
        """Render every pixel x multisample once; accumulate."""
        xres, yres = self.camera.xres, self.camera.yres
        ms = self.ms
        rad_sum = np.zeros((yres, xres, 3), np.float64)
        rays = 0
        for b in range(self.n_blocks):
            s = b * self.block
            e = s + self.block
            px = jnp.asarray(np.tile(self._px[s:e], ms))
            py = jnp.asarray(np.tile(self._py[s:e], ms))
            sample_idx = jnp.asarray(np.repeat(
                np.arange(ms, dtype=np.uint32) + round_idx * ms, self.block))
            result = self._render_fn(
                scene=self.scene, cam=self.camera, px=px, py=py,
                sample_idx=sample_idx, seed=jnp.uint32(self.seed))
            rad = np.asarray(result.radiance, np.float64)
            mask = self._pad_mask[s:e]
            rad = rad.reshape(ms, -1, 3)
            lane_px = self._px[s:e][mask]
            lane_py = self._py[s:e][mask]
            np.add.at(rad_sum, (lane_py, lane_px),
                      rad[:, mask].sum(axis=0))
            rays += int(result.rays)
            self.stats.lanes += int(mask.sum()) * ms
        counts = np.full((yres, xres), float(ms))
        self.acc.add(rad_sum, counts)
        self.stats.rays += rays
        self.stats.rounds += 1

    def render_frame(self, out_path: Optional[str] = None) -> RenderStats:
        """Run the rounds/timed loop, writing the EXR progressively."""
        s = self.settings
        t0 = time.time()
        eta = LowPass()
        round_idx = 0
        while True:
            rt0 = time.time()
            self.render_round(round_idx)
            round_idx += 1
            rt = time.time() - rt0
            self.stats.seconds = time.time() - t0
            if out_path:
                self.acc.save(out_path, scale=s.output_scale)
                self.save_checkpoint(out_path + ".ckpt.npz", round_idx)
            rays_s = self.stats.rays_per_sec
            if s.timed:
                total = s.render_minutes * 60.0
                left = total - self.stats.seconds
                out.log(2, f"Round {round_idx} in {rt:.1f}s | "
                           f"{format_int_thousands(int(rays_s))} rays/s | "
                           f"{format_time(max(0, left))} left")
                if self.stats.seconds >= total:
                    break
            else:
                remaining = (s.rounds - round_idx) * eta.push(rt)
                out.log(2, f"Round {round_idx}/{s.rounds} in {rt:.1f}s | "
                           f"{format_int_thousands(int(rays_s))} rays/s | "
                           f"ETA {format_time(remaining)}")
                if round_idx >= s.rounds:
                    break
        self.stats.seconds = time.time() - t0
        out.log(1, f"Total rays: {format_int_thousands(self.stats.rays)}; "
                   f"avg {format_int_thousands(int(self.stats.rays_per_sec))}"
                   f" rays/s")
        return self.stats

    # ---- checkpoint/resume (SURVEY §5: sum, count, round, seed) ----

    def save_checkpoint(self, path: str, next_round: int) -> None:
        np.savez_compressed(path, sum=self.acc.sum, count=self.acc.count,
                            next_round=next_round, seed=self.seed)

    def load_checkpoint(self, path: str) -> int:
        """Restore accumulation state; returns the next round index."""
        d = np.load(path)
        if int(d["seed"]) != self.seed:
            raise ValueError("checkpoint seed mismatch")
        self.acc.sum = d["sum"]
        self.acc.count = d["count"]
        return int(d["next_round"])
