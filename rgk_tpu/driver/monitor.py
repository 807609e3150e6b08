"""Asynchronous render-progress monitor — the TPU-side counterpart of
the reference's FrameMonitorThread (reference src/render_driver.cpp:
49-139): a daemon thread samples progress counters at 10 Hz and
redraws a BARSIZE-wide progress bar with percent done, elapsed time,
low-pass-filtered ETA and the current rays/s.

Progress here is counted in dispatched wavefront blocks (the host-side
unit of work) rather than pixels — device-side pixel counters would
cost a transfer per sample (see driver/render.py on tunneled-PCIe
costs).  The final summary prints average pixels/s and rays/s with the
same counter semantics as the reference (extension rays only).
"""

from __future__ import annotations

import sys
import threading
import time

from ..utils.format import LowPass, format_int_thousands, format_time

BARSIZE = 75  # reference global_config.hpp:14


class FrameMonitor:
    """10 Hz progress bar over a shared block counter."""

    def __init__(self, total_blocks: int, out_stream=None,
                 enabled: bool = True):
        self.total = max(1, total_blocks)
        self.done = 0
        self.rays = 0.0
        self._t0 = time.time()
        self._eta = LowPass(window=20)
        self._stop = threading.Event()
        self._stream = out_stream if out_stream is not None else sys.stderr
        self._enabled = enabled and getattr(self._stream, "isatty",
                                            lambda: False)()
        self._thread = None

    # -- counters (called from the driver loop) ----------------------
    def add_blocks(self, n: int = 1) -> None:
        self.done += n

    def set_rays(self, rays: float) -> None:
        self.rays = rays

    # -- lifecycle ----------------------------------------------------
    def __enter__(self):
        if self._enabled:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)
            self._draw(final=True)
            self._stream.write("\n")
            self._stream.flush()

    # -- internals ----------------------------------------------------
    def _run(self):
        while not self._stop.wait(0.1):  # 10 Hz, render_driver.cpp:130
            self._draw()

    def _draw(self, final: bool = False):
        frac = min(1.0, self.done / self.total)
        fill = int(BARSIZE * frac)
        bar = "=" * fill + " " * (BARSIZE - fill)
        elapsed = time.time() - self._t0
        if 0 < frac < 1:
            eta = self._eta.push(elapsed / frac * (1.0 - frac))
        else:
            eta = 0.0
        rays_s = self.rays / elapsed if elapsed > 0 else 0.0
        line = (f"\r[{bar}] {100.0 * frac:5.1f}% "
                f"| {format_time(elapsed)} elapsed "
                f"| ETA {format_time(eta)} "
                f"| {format_int_thousands(int(rays_s))} rays/s ")
        self._stream.write(line)
        self._stream.flush()
