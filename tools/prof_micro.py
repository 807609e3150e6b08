"""Microbenchmarks: per-lane row gather vs one-hot MXU gather, hashing,
onb build — the candidate hot spots of the shading path."""
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

R = 1 << 21
M = 36
W = 24
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, M, R), jnp.int32)
table = jnp.asarray(rng.uniform(-1, 1, (M, W)), jnp.float32)
v = jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32)


def timeit(name, fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return dt


@jax.jit
def gather_rows(table, idx):
    return jnp.sum(table[idx], axis=0)


@jax.jit
def gather_rows_barrier(table, idx):
    i = jax.lax.optimization_barrier(idx)
    return jnp.sum(table[i], axis=0)


@jax.jit
def onehot_gather(table, idx):
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
              == idx[:, None]).astype(jnp.float32)
    return jnp.sum(jnp.dot(onehot, table,
                           preferred_element_type=jnp.float32), axis=0)


from rgk_tpu.ops import sampler as smp
from rgk_tpu.ops import vecmath as vm


@jax.jit
def hash3(idx):
    a = smp.hash_u32(idx, idx + 1)
    b = smp.hash_u32(idx, idx + 2)
    c = smp.hash_u32(idx, idx + 3)
    return (a ^ b ^ c).sum()


@jax.jit
def onb(v):
    t, b = vm.build_onb(v)
    return t.sum() + b.sum()


@jax.jit
def normalize3(v):
    return vm.safe_normalize(v).sum()


timeit("row gather [2M]<-36x24", gather_rows, table, idx)
timeit("row gather +barrier", gather_rows_barrier, table, idx)
timeit("one-hot MXU gather", onehot_gather, table, idx)
timeit("3x hash_u32", hash3, idx)
timeit("build_onb", onb, v)
timeit("safe_normalize", normalize3, v)

# wide table (materials pack width 20, few rows)
table20 = jnp.asarray(rng.uniform(-1, 1, (8, 20)), jnp.float32)
idx8 = jnp.asarray(rng.randint(0, 8, R), jnp.int32)


@jax.jit
def gather8(table, idx):
    return jnp.sum(table[idx], axis=0)

timeit("row gather [2M]<-8x20", gather8, table20, idx8)
