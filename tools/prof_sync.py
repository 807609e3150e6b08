#!/usr/bin/env python
"""Microbenchmark the Mosaic vector->scalar sync cost.

Three loops of N iterations inside one Pallas kernel:
  a) vector work only (baseline per-iteration cost)
  b) vector work + jnp.any consumed by the scalar carry SAME iteration
  c) vector work + the reduction consumed ONE iteration LATE
     (pipelined: does reading an old result avoid the drain?)

Usage: python tools/prof_sync.py [--iters 20000]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    N = args.iters

    def make(mode):
        def kernel(x_ref, smem_ref, o_ref):
            v = x_ref[...]                      # [8,128]

            if mode == "a":
                def body(c):
                    i, s = c
                    w = v + i.astype(jnp.float32)
                    m = jnp.max(w)  # reduction issued, NOT consumed
                    del m
                    return (i + 1, s)
                init = (jnp.int32(0), jnp.int32(0))
                cond = lambda c: c[0] < N
                i, s = jax.lax.while_loop(cond, body, init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)
            elif mode == "b":
                def body(c):
                    i, s = c
                    w = v + i.astype(jnp.float32)
                    s = s + (jnp.max(w) > 1e9).astype(jnp.int32)
                    return (i + 1, s)
                init = (jnp.int32(0), jnp.int32(0))
                cond = lambda c: c[0] < N
                i, s = jax.lax.while_loop(cond, body, init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)
            elif mode == "c":  # consume the reduction one iter late
                def body(c):
                    i, s, pending = c
                    s = s + (pending[0, 0] > 1e9).astype(jnp.int32)
                    w = v + i.astype(jnp.float32)
                    newp = jnp.max(w, keepdims=True)[None]  # [1,1]
                    return (i + 1, s, newp.reshape(1, 1))
                init = (jnp.int32(0), jnp.int32(0),
                        jnp.zeros((1, 1), jnp.float32))
                cond = lambda c: c[0] < N
                i, s, _ = jax.lax.while_loop(cond, body, init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)
            elif mode == "d":  # one dynamic SMEM scalar -> vector
                def body(c):
                    i, s = c
                    a = smem_ref[i % 64]
                    w = v + a
                    s = s + (jnp.max(w) > 1e9).astype(jnp.int32)
                    return (i + 1, s)
                init = (jnp.int32(0), jnp.int32(0))
                i, s = jax.lax.while_loop(lambda c: c[0] < N, body,
                                          init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)
            elif mode == "e":  # 8 SMEM scalars -> vector per iter
                def body(c):
                    i, s = c
                    w = v
                    for k in range(8):
                        w = w + smem_ref[(i + k) % 64]
                    s = s + (jnp.max(w) > 1e9).astype(jnp.int32)
                    return (i + 1, s)
                init = (jnp.int32(0), jnp.int32(0))
                i, s = jax.lax.while_loop(lambda c: c[0] < N, body,
                                          init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)
            elif mode == "g":  # f + per-sublane any + pow2 packing
                pow2_col = (jnp.int32(1) << jax.lax.broadcasted_iota(
                    jnp.int32, (8, 1), 0))

                def body(c):
                    i, s = c
                    n = i % 64
                    t0x = (smem_ref[n] - v) * v
                    t1x = (smem_ref[n + 1] - v) * v
                    t0y = (smem_ref[n + 2] - v) * v
                    t1y = (smem_ref[n + 3] - v) * v
                    t0z = (smem_ref[n + 4] - v) * v
                    t1z = (smem_ref[n + 5] - v) * v
                    tn = jnp.maximum(jnp.maximum(
                        jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
                    tf = jnp.minimum(jnp.minimum(
                        jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
                    hit = (tf >= tn) & (tf >= 0.0)
                    any_s = jnp.any(hit, axis=1, keepdims=True)
                    bits = jnp.sum(jnp.where(any_s, pow2_col, 0))
                    s = s + bits
                    return (i + 1, s)
                init = (jnp.int32(0), jnp.int32(0))
                i, s = jax.lax.while_loop(lambda c: c[0] < N, body,
                                          init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)
            else:  # f: slab-like: 6 SMEM scalars, ~18 vec ops, sync
                def body(c):
                    i, s = c
                    n = i % 64
                    t0x = (smem_ref[n] - v) * v
                    t1x = (smem_ref[n + 1] - v) * v
                    t0y = (smem_ref[n + 2] - v) * v
                    t1y = (smem_ref[n + 3] - v) * v
                    t0z = (smem_ref[n + 4] - v) * v
                    t1z = (smem_ref[n + 5] - v) * v
                    tn = jnp.maximum(jnp.maximum(
                        jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
                    tf = jnp.minimum(jnp.minimum(
                        jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
                    hit = (tf >= tn) & (tf >= 0.0)
                    s = s + jnp.any(hit).astype(jnp.int32)
                    return (i + 1, s)
                init = (jnp.int32(0), jnp.int32(0))
                i, s = jax.lax.while_loop(lambda c: c[0] < N, body,
                                          init)
                o_ref[...] = jnp.full((8, 128), s, jnp.int32)

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )

    def make_nested():
        """Nested-while overhead: outer loop entering an inner while
        of ~4 mode-f iterations; compare per-INNER-iteration cost to
        the flat mode f."""
        def kernel(x_ref, smem_ref, o_ref):
            v = x_ref[...]

            def outer_body(c):
                i, s = c

                def inner_body(ci):
                    k, si = ci
                    n = k % 64
                    t0x = (smem_ref[n] - v) * v
                    t1x = (smem_ref[n + 1] - v) * v
                    t0y = (smem_ref[n + 2] - v) * v
                    t1y = (smem_ref[n + 3] - v) * v
                    t0z = (smem_ref[n + 4] - v) * v
                    t1z = (smem_ref[n + 5] - v) * v
                    tn = jnp.maximum(jnp.maximum(
                        jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
                    tf = jnp.minimum(jnp.minimum(
                        jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
                    hit = (tf >= tn) & (tf >= 0.0)
                    return (k + 1, si + jnp.any(hit).astype(jnp.int32))

                k, si = jax.lax.while_loop(
                    lambda ci: ci[0] % 4 != 3, inner_body, (i * 4, s))
                return (i + 1, si)

            i, s = jax.lax.while_loop(lambda c: c[0] < N // 4,
                                      outer_body,
                                      (jnp.int32(0), jnp.int32(0)))
            o_ref[...] = jnp.full((8, 128), s, jnp.int32)

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )

    def make_dma(depth):
        """Per-iteration cost of a [16,128] HBM->VMEM tile fetch with
        `depth` outstanding copies (the cluster kernel's leaf DMA)."""
        def kernel(hbm_ref, o_ref, tile_ref, sem_ref):
            def body(c):
                i, s = c

                @pl.when(i >= depth)
                def _wait():
                    slot = (i - depth) % depth
                    cid = (i - depth) % 64
                    pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(cid * 16, 16), :],
                        tile_ref.at[slot], sem_ref.at[slot]).wait()
                    s_ = tile_ref[slot, 0, 0]
                    del s_
                slot = i % depth
                cid = i % 64
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(cid * 16, 16), :],
                    tile_ref.at[slot], sem_ref.at[slot]).start()
                return (i + 1, s)

            i, s = jax.lax.while_loop(lambda c: c[0] < N, body,
                                      (jnp.int32(0), jnp.int32(0)))
            # Drain
            for k in range(depth):
                @pl.when(k < jnp.minimum(N, depth))
                def _drain(k=k):
                    slot = (N - depth + k) % depth if N >= depth else k
                    cid = (N - depth + k) % 64 if N >= depth else k
                    pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(cid * 16, 16), :],
                        tile_ref.at[slot], sem_ref.at[slot]).wait()
            o_ref[...] = jnp.full((8, 128), s, jnp.int32)

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((depth, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )

    x = jnp.ones((8, 128), jnp.float32)
    sm = jnp.arange(128, dtype=jnp.float32)
    for mode in ("a", "b", "c", "d", "e", "f", "g"):
        fn = jax.jit(lambda x, sm, m=mode: make(m)(x, sm))
        r = jax.block_until_ready(fn(x, sm))
        t0 = time.time()
        for _ in range(args.reps):
            r = jax.block_until_ready(fn(x, sm))
        dt = (time.time() - t0) / args.reps
        print(f"mode {mode}: {dt*1e9/N:8.1f} ns/iteration")

    fnn = jax.jit(lambda x, sm: make_nested()(x, sm))
    r = jax.block_until_ready(fnn(x, sm))
    t0 = time.time()
    for _ in range(args.reps):
        r = jax.block_until_ready(fnn(x, sm))
    dt = (time.time() - t0) / args.reps
    print(f"nested-f: {dt*1e9/N:8.1f} ns/inner-iteration")


    def make_sweep(gated):
        """Per-iteration cost of one [128,16]-tilt Badouel slice sweep
        (the cluster kernel's _sweep_slice), optionally behind 8
        pl.when branches (1 taken)."""
        from rgk_tpu.ops.pallas_cluster import _sweep_slice

        def kernel(tile_ref, o_ref, st_ref):
            st_ref[...] = jnp.full((8, 128), 1e30, jnp.float32)
            rays = tuple(tile_ref[k:k + 1, :] for k in range(6))
            tmin = jnp.zeros((1, 128), jnp.float32)
            excl = jnp.full((1, 128), -1, jnp.int32)

            def body(c):
                i, s = c
                tilt = tile_ref[...].T

                if gated:
                    for j in range(8):
                        @pl.when((i + j) % 8 == 0)
                        def _sw(j=j):
                            bt = st_ref[j:j + 1, :]
                            ts, is_, bs, cs = _sweep_slice(
                                tilt, rays, tmin, bt, excl,
                                (bt, excl, tmin, tmin))
                            st_ref[j:j + 1, :] = ts
                else:
                    bt = st_ref[0:1, :]
                    ts, is_, bs, cs = _sweep_slice(
                        tilt, rays, tmin, bt, excl,
                        (bt, excl, tmin, tmin))
                    st_ref[0:1, :] = ts
                return (i + 1, s)

            i, s = jax.lax.while_loop(lambda c: c[0] < N // 10, body,
                                      (jnp.int32(0), jnp.int32(0)))
            o_ref[...] = jnp.full((8, 128), s, jnp.int32) + \
                st_ref[...].astype(jnp.int32)

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )

    tile = jnp.ones((16, 128), jnp.float32)
    for name, gated in (("sweep", False), ("sweep+8when", True)):
        fn = jax.jit(lambda t, g=gated: make_sweep(g)(t))
        r = jax.block_until_ready(fn(tile))
        t0 = time.time()
        for _ in range(args.reps):
            r = jax.block_until_ready(fn(tile))
        dt = (time.time() - t0) / args.reps
        print(f"{name}: {dt*1e9/(N//10):8.1f} ns/iteration")

    hbm = jnp.ones((64 * 16, 128), jnp.float32)
    for depth in (1, 2, 4, 8):
        fn = jax.jit(lambda h, d=depth: make_dma(d)(h))
        r = jax.block_until_ready(fn(hbm))
        t0 = time.time()
        for _ in range(args.reps):
            r = jax.block_until_ready(fn(hbm))
        dt = (time.time() - t0) / args.reps
        print(f"dma depth {depth}: {dt*1e9/N:8.1f} ns/tile")
    return 0


if __name__ == "__main__":
    sys.exit(main())
