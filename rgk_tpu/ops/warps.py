"""Sample warping: [0,1)^2 -> discs, hemispheres, spheres, triangles.

Lane-parallel JAX ports of the reference's warping routines (reference
src/random_utils.hpp:12-73).  Exact formula parity is kept so that the
integrator's sampling distributions match the reference's statistically.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import vecmath as vm

TWO_PI = 2.0 * jnp.pi


def to_disc_uniform(sample):
    """[..., 2] -> uniform unit disc. (reference random_utils.hpp:12-16;
    note the reference uses (sin, cos) order.)"""
    r = jnp.sqrt(sample[..., 0])
    a = sample[..., 1] * TWO_PI
    return jnp.stack([r * jnp.sin(a), r * jnp.cos(a)], axis=-1)


def to_hemisphere_cosine_z(sample):
    """Cosine-weighted hemisphere with z > 0 (random_utils.hpp:39-43)."""
    p = to_disc_uniform(sample)
    z = jnp.sqrt(jnp.maximum(1e-5, 1.0 - p[..., 0] ** 2 - p[..., 1] ** 2))
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def to_hemisphere_cosine_y(sample):
    """Cosine-weighted hemisphere with y > 0 (random_utils.hpp:33-37)."""
    p = to_disc_uniform(sample)
    y = jnp.sqrt(jnp.maximum(1e-5, 1.0 - p[..., 0] ** 2 - p[..., 1] ** 2))
    return jnp.stack([p[..., 0], y, p[..., 1]], axis=-1)


def to_hemisphere_cosine_directed(sample, direction):
    """Cosine-weighted hemisphere around unit `direction`
    (random_utils.hpp:45-47: RotationFromY applied to the Y-up warp)."""
    return vm.rotation_from_y(direction, to_hemisphere_cosine_y(sample))


def to_sphere_uniform(sample):
    """Uniform unit sphere (random_utils.hpp:49-56)."""
    z = sample[..., 0] * 2.0 - 1.0
    a = sample[..., 1] * TWO_PI
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)


def to_triangle_uniform(sample, a, b, c):
    """Uniform point on triangle (a, b, c); parallelogram-fold method.

    Mirrors reference Triangle::GetRandomPoint (src/primitives.cpp:62-75)
    including its vertex-role swap: edges are taken from vertex *b* with
    rx weighting (a-b) and ry weighting (c-b).
    """
    rx = sample[..., 0:1]
    ry = sample[..., 1:2]
    flip = (rx + ry) > 1.0
    rx = jnp.where(flip, 1.0 - rx, rx)
    ry = jnp.where(flip, 1.0 - ry, ry)
    return b + rx * (a - b) + ry * (c - b)


def decide_and_rescale(sample, probability):
    """Stochastically split a 1-D sample (random_utils.hpp:63-73).

    Returns (took_first_branch: bool[...], rescaled_sample: f32[...]).
    The rescaled sample is uniform on [0,1) conditioned on the branch,
    letting one sample dimension drive both a discrete choice and a
    continuous warp.
    """
    p = probability
    take = sample < p
    denom_t = jnp.maximum(p, 1e-12)
    denom_f = jnp.maximum(1.0 - p, 1e-12)
    rescaled = jnp.where(take, sample / denom_t, (sample - p) / denom_f)
    take = jnp.where(p <= 0.0, jnp.zeros_like(take), take)
    take = jnp.where(p >= 1.0, jnp.ones_like(take), take)
    return take, jnp.clip(rescaled, 0.0, 1.0 - 1e-7)
