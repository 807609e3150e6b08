"""Differentiable rendering: the trainable-parameter view of a scene.

The renderer (integrator/path.py) is a pure function of SceneArrays,
so gradients "just work" through shading — this module defines which
leaves constitute the *parameter pytree* (matching BASELINE.json's
differentiability surface: material albedo/specular/roughness,
emission, texture texels, light color/intensity, sky) and keeps the
derived light tables consistent so emission gradients flow through
both the surface-emission term and the NEE/areal-light radiance.

Discrete sampling decisions (light pick, RR, lobe choice) use
*detached* probabilities: sample values never depend on parameters,
so a fixed seed gives a smooth, finite-difference-checkable loss.
The power prefix tables are recomputed from parameters but wrapped in
stop_gradient — changing them alters the estimator's variance, not
its expectation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


PARAM_KEYS = ("mat_diffuse", "mat_specular", "mat_emission",
              "mat_roughness", "texels", "light_color",
              "light_intensity", "sky_color", "sky_intensity")


def extract_params(scene) -> Dict[str, jnp.ndarray]:
    """The trainable leaves of a committed scene."""
    return {
        "mat_diffuse": scene.materials.diffuse,
        "mat_specular": scene.materials.specular,
        "mat_emission": scene.materials.emission,
        "mat_roughness": scene.materials.roughness,
        "texels": scene.textures.texels,
        "light_color": scene.lights.point_color,
        "light_intensity": scene.lights.point_intensity,
        "sky_color": scene.sky_color,
        "sky_intensity": scene.sky_intensity,
    }


def apply_params(scene, params: Dict[str, jnp.ndarray]):
    """Rebuild SceneArrays with `params` substituted.

    Derived quantities are kept consistent:
    * the emission columns of the de-indexed areal-light rows
      (LightTable.areal_rows[:, 12:15] — the values NEE and BDPT
      light-path radiance actually read, ops/lights.py sample_light)
      follow the owning material's emission, so emission gradients
      reach direct lighting;
    * light power prefix tables (point_cum, areal_cum, totals) follow
      intensity/emission but are stop_gradient-ed: the sampling
      distribution is detached — changing it alters the estimator's
      variance, not its expectation — and stays fixed under autodiff.
    """
    mats = scene.materials._replace(
        diffuse=params["mat_diffuse"],
        specular=params["mat_specular"],
        emission=params["mat_emission"],
        roughness=params["mat_roughness"],
    )
    textures = scene.textures._replace(texels=params["texels"])

    lights = scene.lights
    # Re-derive areal emission from the (possibly updated) materials
    # and write it into the de-indexed rows the sampler reads.
    areal_mat = scene.tri_mat[lights.areal_tri]
    areal_emission = params["mat_emission"][areal_mat]
    areal_rows = lights.areal_rows.at[:, 12:15].set(areal_emission)

    sg = jax.lax.stop_gradient
    point_power = params["light_intensity"] * (4.0 * jnp.pi)
    # Areal pick weight = area * sum(emission) (scene.cpp:323-347);
    # areas recomputed from the row vertices so the prefix table stays
    # consistent with updated emission (detached, see above).
    va = lights.areal_rows[:, 0:3]
    vb = lights.areal_rows[:, 3:6]
    vc = lights.areal_rows[:, 6:9]
    areas = 0.5 * jnp.linalg.norm(jnp.cross(va - vb, vc - vb), axis=-1)
    areal_power = areas * areal_emission.sum(axis=-1)
    lights = lights._replace(
        point_color=params["light_color"],
        point_intensity=params["light_intensity"],
        point_cum=sg(jnp.cumsum(point_power)),
        total_point_power=sg(point_power.sum()),
        areal_rows=areal_rows,
        areal_cum=sg(jnp.cumsum(areal_power)),
        total_areal_power=sg(areal_power.sum()),
    )
    return scene._replace(
        materials=mats,
        textures=textures,
        lights=lights,
        sky_color=params["sky_color"],
        sky_intensity=params["sky_intensity"],
    )


def make_loss_fn(scene, meta, settings, cam, px, py, sample_idx, seed,
                 target, sampler_mode: int = 1):
    """L2 image-matching loss as a function of the parameter pytree.

    Returns loss_fn(params) -> scalar; differentiate with jax.grad.
    `target` is per-lane target radiance [R, 3].
    """
    from ..integrator.path import render_lanes

    def loss_fn(params):
        s = apply_params(scene, params)
        result = render_lanes(s, meta, settings, cam, px, py,
                              sample_idx, seed, sampler_mode,
                              differentiable=True)
        diff = result.radiance - target
        return jnp.mean(diff * diff)

    return loss_fn
