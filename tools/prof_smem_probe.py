#!/usr/bin/env python
"""Probe the TPU's usable SMEM scratch budget + scalar bitcast support.

Round-5 design questions for the v6 cluster kernel:
  1. how many bytes of pltpu.SMEM scratch will Mosaic accept?
  2. does a scalar `bitcast int32 -> f32` (bf16-packed box unpack)
     lower inside a kernel?
  3. does a dynamic-offset DMA of a row of an HBM int32 [8, N] table
     into SMEM scratch work (per-octant link paging)?
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")


def probe_smem(n_words):
    def kernel(x_ref, o_ref, s_ref):
        s_ref[0] = x_ref[0, 0].astype(jnp.int32)
        o_ref[...] = x_ref[...] + s_ref[n_words - 1].astype(jnp.float32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((n_words,), jnp.int32)],
    )
    try:
        jax.jit(f).lower(jnp.zeros((8, 128), jnp.float32)).compile()
        return True
    except Exception as e:
        print(f"  {n_words*4} bytes: FAIL ({str(e)[:120]})")
        return False


def probe_bitcast():
    """Scalar u16-pair fixed-point unpack from an SMEM int32 word.

    (A scalar bitcast int32->f32 does NOT lower in Mosaic — tpu.bitcast
    is vector-only — so quantized boxes use integer fixed point with
    sitofp, which this probes.)"""
    def kernel(w_ref, x_ref, o_ref):
        w = w_ref[0]
        hi = ((w >> 16) & 0xFFFF).astype(jnp.float32)
        lo = (w & 0xFFFF).astype(jnp.float32)
        o_ref[...] = (x_ref[...] - hi) * lo

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    x = jnp.ones((8, 128), jnp.float32) * 3.0
    # word = 2 in high half, 5 in low half -> (3-2)*5 = 5
    w = jnp.asarray([(2 << 16) | 5], jnp.int32)
    r = np.asarray(jax.jit(f)(w, x))
    ok = np.allclose(r, 5.0)
    print(f"scalar u16 fixed-point unpack: "
          f"{'OK' if ok else f'WRONG {r[0, 0]}'}")
    return ok


def probe_octant_dma(n):
    """Dynamic-offset row DMA from HBM [8, n] int32 into SMEM [n]."""
    def kernel(oct_ref, tab_hbm, o_ref, s_ref, sem):
        o = oct_ref[0]
        pltpu.make_async_copy(tab_hbm.at[o], s_ref, sem).start()
        pltpu.make_async_copy(tab_hbm.at[o], s_ref, sem).wait()
        o_ref[...] = jnp.full((8, 128), s_ref[n - 1], jnp.int32)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((n,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    tab = jnp.arange(8 * n, dtype=jnp.int32).reshape(8, n)
    r = np.asarray(jax.jit(f)(jnp.asarray([3], jnp.int32), tab))
    ok = (r == 3 * n + n - 1).all()
    print(f"octant-row DMA (n={n}): {'OK' if ok else f'WRONG {r[0, 0]}'}")
    return ok


if __name__ == "__main__":
    print("devices:", jax.devices())
    print("probing SMEM scratch ceiling...")
    for kb in (768, 832, 896, 960):
        ok = probe_smem(kb * 256)
        print(f"  SMEM {kb} KB: {'OK' if ok else 'fail'}")
        if not ok:
            break
    probe_bitcast()
    probe_octant_dma(15593)
    probe_octant_dma(31251)
    sys.exit(0)
