"""Stateless counter-based sampling for wavefront path tracing.

The reference uses mutable per-pixel sampler objects (mt19937 +
std::shuffle, reference src/sampler.cpp) — a pattern that cannot run
lane-parallel on a vector machine.  Here every sample value is a pure
function of ``(seed, pixel_index, sample_index, dimension)``:

* ``independent`` — a PCG/murmur-style 32-bit hash mixer, equivalent in
  spirit to the reference's IndependentSampler.
* ``halton`` (default) — per-dimension radical inverse in the first 256
  prime bases over the *global* sample index (the reference's vendored
  Gruenschloss sampler covers the same 256 dims,
  external/halton_sampler.h), decorrelated across pixels and dimensions
  with a hash-based Cranley-Patterson rotation.  This plays the role of
  the reference's stratified/low-discrepancy samplers (StratifiedSampler
  is the reference default, src/path_tracer.cpp:49) while staying
  stateless and order-independent.  Dynamic per-lane bounce loops fold
  the bounce index into the seed instead of the dimension (a dynamic
  prime base would need a per-lane gather), so static dims 0..255 are
  genuine Halton and per-bounce dims are Halton with per-bounce
  rotations.

The *dimension consumption ledger* (which dim feeds which decision) is
fixed in the integrator, mirroring the reference's deterministic
consumption order (SURVEY §3.5) — this is the reproducibility contract:
re-rendering with the same seed is bitwise identical, on any device
mesh shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# First 256 primes — the reference's Halton dimension range
# (external/halton_sampler.h).
_PRIMES = (
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37,
    41, 43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 89,
    97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151,
    157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223,
    227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281,
    283, 293, 307, 311, 313, 317, 331, 337, 347, 349, 353, 359,
    367, 373, 379, 383, 389, 397, 401, 409, 419, 421, 431, 433,
    439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499, 503,
    509, 521, 523, 541, 547, 557, 563, 569, 571, 577, 587, 593,
    599, 601, 607, 613, 617, 619, 631, 641, 643, 647, 653, 659,
    661, 673, 677, 683, 691, 701, 709, 719, 727, 733, 739, 743,
    751, 757, 761, 769, 773, 787, 797, 809, 811, 821, 823, 827,
    829, 839, 853, 857, 859, 863, 877, 881, 883, 887, 907, 911,
    919, 929, 937, 941, 947, 953, 967, 971, 977, 983, 991, 997,
    1009, 1013, 1019, 1021, 1031, 1033, 1039, 1049, 1051, 1061, 1063, 1069,
    1087, 1091, 1093, 1097, 1103, 1109, 1117, 1123, 1129, 1151, 1153, 1163,
    1171, 1181, 1187, 1193, 1201, 1213, 1217, 1223, 1229, 1231, 1237, 1249,
    1259, 1277, 1279, 1283, 1289, 1291, 1297, 1301, 1303, 1307, 1319, 1321,
    1327, 1361, 1367, 1373, 1381, 1399, 1409, 1423, 1427, 1429, 1433, 1439,
    1447, 1451, 1453, 1459, 1471, 1481, 1483, 1487, 1489, 1493, 1499, 1511,
    1523, 1531, 1543, 1549, 1553, 1559, 1567, 1571, 1579, 1583, 1597, 1601,
    1607, 1609, 1613, 1619,
)

_U32 = jnp.uint32


MODE_INDEPENDENT = 0   # reference IndependentSampler (sampler.hpp:22-40)
MODE_HALTON = 1        # reference HaltonSampler (sampler.hpp:128-154)
MODE_STRATIFIED = 2    # reference StratifiedSampler — the default
#                        (sampler.cpp:77-116, path_tracer.cpp:49)
MODE_LHS = 3           # reference LatinHypercubeSampler (sampler.cpp:38-58)
MODE_VDC = 4           # reference VanDerCorputSampler (sampler.cpp:118-143)

MODE_NAMES = {
    "independent": MODE_INDEPENDENT,
    "halton": MODE_HALTON,
    "stratified": MODE_STRATIFIED,
    "lhs": MODE_LHS,
    "latin_hypercube": MODE_LHS,
    "vandercorput": MODE_VDC,
    "vdc": MODE_VDC,
}


class SampleCtx(NamedTuple):
    """Per-lane sampling context.

    seed:   scalar uint32 root seed (mixes run seed and round index)
    pixel:  uint32[...]  pixel index (y * xres + x) per lane
    sample: uint32[...]  global sample index per lane (round-unique)
    mode:   int — one of MODE_* (static per trace)
    n_set:  int — samples per stratification set (static; the round's
            multisample count).  Stratified/LHS modes stratify the
            sample's position within its set, mirroring the
            reference's per-pixel prepared sample tables.
    """

    seed: jnp.ndarray
    pixel: jnp.ndarray
    sample: jnp.ndarray
    mode: int = 1
    n_set: int = 1


def _mix(x):
    """murmur3 finalizer: a high-quality 32-bit bit mixer."""
    x = x.astype(_U32)
    x = x ^ (x >> 16)
    x = x * _U32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * _U32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_u32(*parts):
    """Combine integer arrays into one well-mixed uint32."""
    h = _U32(0x9E3779B9)
    for p in parts:
        h = _mix(h ^ (jnp.asarray(p).astype(_U32) * _U32(0x85EBCA6B)))
    return h


def _u32_to_unit_float(u):
    # Top 24 bits -> [0, 1) with full float32 resolution.
    return (u >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def hash01(*parts):
    return _u32_to_unit_float(hash_u32(*parts))


def _radical_inverse(index, base: int):
    """Radical inverse of `index` in integer `base` (static base)."""
    if base == 2:
        # Bit reversal — exact and fast.
        v = index.astype(_U32)
        v = ((v >> 1) & _U32(0x55555555)) | ((v & _U32(0x55555555)) << 1)
        v = ((v >> 2) & _U32(0x33333333)) | ((v & _U32(0x33333333)) << 2)
        v = ((v >> 4) & _U32(0x0F0F0F0F)) | ((v & _U32(0x0F0F0F0F)) << 4)
        v = ((v >> 8) & _U32(0x00FF00FF)) | ((v & _U32(0x00FF00FF)) << 8)
        v = (v >> 16) | (v << 16)
        return v.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    inv_base = jnp.float32(1.0 / base)
    # ceil(log_base(2^32)) digits is enough; unrolled statically.
    import math

    n_digits = int(math.ceil(32.0 / math.log2(base)))
    idx = index.astype(jnp.uint32)
    result = jnp.zeros(index.shape, jnp.float32)
    scale = jnp.float32(1.0)
    for _ in range(n_digits):
        digit = (idx % base).astype(jnp.float32)
        idx = idx // base
        scale = scale * inv_base
        result = result + digit * scale
    return result


def _permute(idx, n: int, key):
    """Stateless pseudorandom permutation of [0, n) (Kensler-style
    cycle-walking hash) — the counter-based stand-in for the
    reference's per-dimension std::shuffle of prepared sample tables
    (sampler.cpp:85-116).  idx: uint32 array; n static; key uint32."""
    if n <= 1:
        return jnp.zeros_like(idx)
    # Round n up to a power of two and cycle-walk.
    w = max(1, (n - 1).bit_length())
    mask = _U32((1 << w) - 1)

    def round_fn(x, k):
        x = x ^ k
        x = (x * _U32(0xE170893D)) & mask
        x = x ^ (x >> max(1, w // 2))
        x = (x * _U32(0x929E3149)) & mask
        x = x ^ (x >> max(1, (w + 1) // 2))
        return x & mask

    x = idx.astype(_U32) & mask

    # Cycle-walk: apply until in range.  With n up to 2^w < 2n, at
    # most a handful of walks are needed; 4 fixed rounds of
    # re-permutation keep it trace-static (out-of-range values walk
    # again; in-range values are stable under the conditional).
    for i in range(6):
        k = _mix(key ^ _U32(0x9E3779B9 + i))
        cand = round_fn(x, k)
        x = jnp.where(x >= n, cand, x)
    # Any stragglers (astronomically unlikely) fold by modulo.
    return x % n


def _stratified_1d(ctx: SampleCtx, dim: int):
    """Per-(pixel, dim) shuffled 1-D strata + jitter
    (reference StratifiedSampler 1D, sampler.cpp:77-95)."""
    n = max(1, ctx.n_set)
    s_local = ctx.sample % _U32(n)
    key = hash_u32(ctx.pixel, jnp.uint32(dim), ctx.seed,
                   ctx.sample // _U32(n))
    stratum = _permute(s_local, n, key).astype(jnp.float32)
    jit = hash01(ctx.pixel, ctx.sample, jnp.uint32(dim), ctx.seed)
    return (stratum + jit) / jnp.float32(n)


def _stratified_2d(ctx: SampleCtx, dim: int):
    """sqrt(n) x sqrt(n) grid jitter (reference StratifiedSampler 2D,
    sampler.cpp:96-116; the set size there is rounded up to a perfect
    square — here strata permute within the round's set and map into
    the grid)."""
    import math

    n = max(1, ctx.n_set)
    n2 = int(math.ceil(math.sqrt(n)))
    s_local = ctx.sample % _U32(n)
    key = hash_u32(ctx.pixel, jnp.uint32(dim), ctx.seed,
                   ctx.sample // _U32(n))
    stratum = _permute(s_local, n2 * n2, key)
    cx = (stratum % _U32(n2)).astype(jnp.float32)
    cy = (stratum // _U32(n2)).astype(jnp.float32)
    jx = hash01(ctx.pixel, ctx.sample, jnp.uint32(dim), ctx.seed)
    jy = hash01(ctx.pixel, ctx.sample, jnp.uint32(dim + 1), ctx.seed)
    return jnp.stack([(cx + jx) / n2, (cy + jy) / n2], axis=-1)


def _lhs_1d(ctx: SampleCtx, dim: int):
    """Latin hypercube: independent per-dim permutations of the strata
    (reference LatinHypercubeSampler, sampler.cpp:38-58)."""
    return _stratified_1d(ctx, dim)


def _vdc_1d(ctx: SampleCtx, dim: int):
    """Van der Corput base-2 with per-(pixel, dim) scramble
    (reference VanDerCorputSampler, sampler.cpp:118-143)."""
    scramble = hash_u32(ctx.pixel, jnp.uint32(dim), ctx.seed)
    v = _radical_inverse(ctx.sample ^ scramble, 2)
    shift = hash01(ctx.pixel, jnp.uint32(dim + 97), ctx.seed)
    u = v + shift
    return u - jnp.floor(u)


def sample_1d(ctx: SampleCtx, dim: int):
    """Deterministic uniform [0,1) for (lane, dim).  `dim` is static."""
    if ctx.mode == MODE_HALTON and dim < len(_PRIMES):
        v = _radical_inverse(ctx.sample, _PRIMES[dim])
        # Cranley-Patterson rotation decorrelates pixels & dimensions.
        shift = hash01(ctx.pixel, jnp.uint32(dim), ctx.seed)
        u = v + shift
        u = u - jnp.floor(u)
    elif ctx.mode in (MODE_STRATIFIED, MODE_LHS) and ctx.n_set > 1:
        u = _stratified_1d(ctx, dim)
    elif ctx.mode == MODE_VDC:
        u = _vdc_1d(ctx, dim)
    else:
        u = _u32_to_unit_float(
            hash_u32(ctx.pixel, ctx.sample, jnp.uint32(dim), ctx.seed)
        )
    return jnp.minimum(u, jnp.float32(1.0 - 1e-7))


def sample_2d(ctx: SampleCtx, dim: int):
    """Deterministic uniform [0,1)^2 consuming dims (dim, dim+1).

    Stratified mode uses the reference's sqrt(n)-grid 2-D strata;
    LHS keeps independent per-dimension permutations (that IS the
    Latin hypercube construction)."""
    if ctx.mode == MODE_STRATIFIED and ctx.n_set > 1:
        return _stratified_2d(ctx, dim)
    return jnp.stack([sample_1d(ctx, dim), sample_1d(ctx, dim + 1)], axis=-1)


# Dimension ledger for the integrator (mirrors the reference's
# consumption order, SURVEY §3.5; kept fixed regardless of material so
# the mapping is data-independent and lane-parallel):
DIM_PIXEL_JITTER = 0      # 2D subpixel offset
DIM_LENS = 2              # 2D thin-lens disc sample
DIM_AREAL = 4             # 2D areal-light surface sample
DIM_LIGHTDIR = 6          # 2D light-path emission direction
DIM_LIGHT_CHOICE = 8      # 2D light pick + 1D triangle pick
DIM_LIGHT_TRI = 10        # 1D
DIM_EYE_BOUNCE = 11       # 3 dims per eye bounce: bxdf 2D + russian 1D
DIMS_PER_BOUNCE = 3


def eye_bounce_dim(bounce: int, max_depth: int = 0) -> int:
    return DIM_EYE_BOUNCE + DIMS_PER_BOUNCE * bounce


def light_bounce_dim(bounce: int, max_depth: int) -> int:
    """Light-subpath dims start after all eye-bounce dims."""
    return DIM_EYE_BOUNCE + DIMS_PER_BOUNCE * (max_depth + bounce)
