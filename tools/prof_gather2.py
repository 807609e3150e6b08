"""Compare gather strategies inside a while_loop consuming sliced columns."""
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
K = 24
rng = np.random.RandomState(0)
table = jnp.asarray(rng.uniform(-1, 1, (M, K)), jnp.float32)
v3 = jnp.asarray(rng.uniform(0.1, 1, (R, 3)), jnp.float32)


def consume(rows, v3):
    # mimic _shade_point: interpolate three 3-vectors + norms + compares
    a = rows[..., 0:3] * v3 + rows[..., 3:6] * (1 - v3) + rows[..., 6:9]
    n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    pred1 = rows[..., 9] > 0.5
    pred2 = rows[..., 10] > 0.0
    pred3 = jnp.abs(rows[..., 12]) < 0.3
    return n * jnp.where((pred1 & pred2 & pred3)[..., None], 1.0, 0.5)


def loop(gather_fn, n_iter=10):
    def body(carry):
        i, v = carry
        idx = (jnp.abs(v[:, 0] * 1000).astype(jnp.int32) + i) % M
        rows = gather_fn(table, idx)
        v = consume(rows, v) * 0.999 + 0.001
        return i + 1, v

    def cond(c):
        return c[0] < n_iter

    return jax.lax.while_loop(cond, body, (jnp.int32(0), v3))[1].sum()


def g_gather(table, idx):
    rows = table[jax.lax.optimization_barrier(idx)]
    return jax.lax.optimization_barrier(rows)


def g_matmul(table, idx):
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (M, R), 0)
              == idx[None, :]).astype(jnp.float32)
    cols = jnp.dot(table.T, onehot, preferred_element_type=jnp.float32)
    return jnp.moveaxis(cols, 0, -1)


def g_matmul_bf16(table, idx):
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (M, R), 0)
              == idx[None, :]).astype(jnp.bfloat16)
    cols = jnp.dot(table.T.astype(jnp.bfloat16), onehot,
                   preferred_element_type=jnp.float32)
    return jnp.moveaxis(cols, 0, -1)


for name, fn in [("gather", g_gather), ("onehot-f32", g_matmul),
                 ("onehot-bf16", g_matmul_bf16)]:
    f = jax.jit(lambda v, fn=fn: loop(fn))
    r = f(v3); jax.block_until_ready(r)
    t0 = time.time(); n = 5
    for _ in range(n):
        r = f(v3)
    jax.block_until_ready(r)
    print(f"{name:12s} {(time.time()-t0)/n*1e3:8.2f} ms / 10 iters")
