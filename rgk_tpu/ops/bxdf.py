"""Branchless BxDF dispatch: eval and sample for whole wavefronts.

The reference dispatches through a virtual BxDF hierarchy per ray
(reference src/bxdf/bxdf.cpp); on a vector machine every lane computes
all (cheap) lobes plus one LTC table fetch, then selects by the
material's `bxdf_type` — no divergence, pure VPU + gathers.

Conventions (identical to the reference, src/bxdf/bxdf.hpp):
* all vectors in the local shading frame, +Z = shading normal;
* `eval(Vi, Vr)` returns the BRDF *value* f (pi-normalized where
  applicable) used by NEE/BDPT connections;
* `sample(Vi, u2)` returns (direction, throughput, may_leak) where
  throughput is the fully importance-sampled weight (albedo), and
  may_leak marks transmission lobes allowed to cross the surface
  (transparent, dielectric refraction);
* delta lobes (mirror/transparent/dielectric) eval to their albedo
  when Vr matches the delta direction within the reference's 1e-4
  cosine tolerance, else 0 — this makes NEE a no-op on them, exactly
  like the reference.

One-level mix materials are supported: eval blends both leaves,
sample picks a leaf with DecideAndRescale (bxdf.cpp BxDFMix).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.arrays import (
    BSDF_DIELECTRIC,
    BSDF_DIFFUSE,
    BSDF_LTC_BECKMANN,
    BSDF_LTC_BECKMANN_DIFFUSE,
    BSDF_LTC_GGX,
    BSDF_LTC_GGX_DIFFUSE,
    BSDF_MIRROR,
    BSDF_MIX,
    BSDF_TRANSPARENT,
)
from . import ltc as ltc_ops
from . import textures as tex_ops
from . import vecmath as vm
from . import warps

PI = 3.14159265358979


def _fresnel_dielectric(eta, cos_theta):
    """(reflectance, cos_theta_trans) — reference FresnellDielectric
    (bxdf.cpp:332-354).  eta flips when the ray comes from below."""
    flip = cos_theta < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_theta = jnp.abs(cos_theta)
    sin_t_sq = eta * eta * (1.0 - cos_theta * cos_theta)
    tir = sin_t_sq > 1.0
    # max(., 1e-12) keeps sqrt's gradient finite at grazing TIR.
    cos_trans = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 1e-12))
    rs = (eta * cos_theta - cos_trans) / jnp.maximum(
        eta * cos_theta + cos_trans, 1e-12)
    rp = (eta * cos_trans - cos_theta) / jnp.maximum(
        eta * cos_trans + cos_theta, 1e-12)
    r = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, r), jnp.where(tir, 0.0, cos_trans)


def _resolve(scene, tex_id, solid, uv):
    return tex_ops.resolve_color(scene.textures, tex_id, solid, uv)


class MatParams:
    """Per-lane gathered material parameters."""

    def __init__(self, scene, mat_id, uv):
        m = scene.materials
        self.bxdf_type = m.bxdf_type[mat_id]
        self.diffuse = _resolve(scene, m.diffuse_tex[mat_id],
                                m.diffuse[mat_id], uv)
        self.specular = _resolve(scene, m.specular_tex[mat_id],
                                 m.specular[mat_id], uv)
        self.roughness = m.roughness[mat_id]
        self.ior = m.ior[mat_id]
        # LTC table kind: even enum values are Beckmann, odd GGX
        self.ltc_kind = jnp.where(
            (self.bxdf_type == BSDF_LTC_GGX)
            | (self.bxdf_type == BSDF_LTC_GGX_DIFFUSE),
            ltc_ops.KIND_GGX, ltc_ops.KIND_BECKMANN)


def _eval_base(scene, tables, p: MatParams, vi, vr):
    """All-lobes eval, selected by type.  vi/vr: local [...,3]."""
    viz = vi[..., 2]
    vrz = vr[..., 2]
    both_up = (viz > 0.0) & (vrz > 0.0)

    f_diffuse = jnp.where(both_up[..., None], p.diffuse / PI, 0.0)

    refl = vm.reflect_z(vi)
    is_mirror_dir = jnp.abs(vm.dot(refl, vr) - 1.0) < 1e-4
    f_mirror = jnp.where(is_mirror_dir[..., None], p.specular, 0.0)

    is_inverse_dir = jnp.abs(vm.dot(-vi, vr) - 1.0) < 1e-4
    f_transparent = jnp.where(is_inverse_dir[..., None],
                              jnp.ones_like(p.specular), 0.0)

    # Dielectric (bxdf.cpp BxDFDielectric::value:356-378)
    eta = jnp.where(viz < 0.0, p.ior, 1.0 / p.ior)
    r_p, cos_t = _fresnel_dielectric(eta, viz)
    same_side = viz * vrz > 0.0
    refr = jnp.stack([
        -vi[..., 0] * eta,
        -vi[..., 1] * eta,
        jnp.where(viz > 0.0, -cos_t, cos_t)], axis=-1)
    is_refr_dir = jnp.abs(vm.dot(vr, refr) - 1.0) < 1e-3
    f_dielectric = jnp.where(
        same_side[..., None],
        jnp.where(is_mirror_dir[..., None], r_p[..., None] * p.specular, 0.0),
        jnp.where(is_refr_dir[..., None],
                  (1.0 - r_p)[..., None] * p.specular, 0.0))

    # LTC: frame around outgoing vr, evaluated at vi (bxdf.hpp:110-114)
    ltc_val = ltc_ops.pdf(tables, p.ltc_kind, vr, vi, p.roughness)
    f_ltc = jnp.where(both_up[..., None],
                      p.specular * ltc_val[..., None], 0.0)
    f_ltc_diffuse = jnp.where(
        both_up[..., None],
        p.specular * ltc_val[..., None] + p.diffuse / PI, 0.0)

    t = p.bxdf_type[..., None]
    out = jnp.where(t == BSDF_DIFFUSE, f_diffuse, 0.0)
    out = jnp.where(t == BSDF_MIRROR, f_mirror, out)
    out = jnp.where(t == BSDF_TRANSPARENT, f_transparent, out)
    out = jnp.where(t == BSDF_DIELECTRIC, f_dielectric, out)
    out = jnp.where((t == BSDF_LTC_BECKMANN) | (t == BSDF_LTC_GGX),
                    f_ltc, out)
    out = jnp.where((t == BSDF_LTC_BECKMANN_DIFFUSE)
                    | (t == BSDF_LTC_GGX_DIFFUSE), f_ltc_diffuse, out)
    return out


def eval_bxdf(scene, mat_id, vi, vr, uv, tables=None):
    """BRDF value f(Vi, Vr) for lanes; handles one-level mixes."""
    if tables is None:
        tables = ltc_ops.load_tables()
    m = scene.materials
    p = MatParams(scene, mat_id, uv)
    base = _eval_base(scene, tables, p, vi, vr)

    is_mix = m.bxdf_type[mat_id] == BSDF_MIX
    m1 = m.mix_m1[mat_id]
    m2 = m.mix_m2[mat_id]
    amt = m.mix_amt[mat_id][..., None]
    f1 = _eval_base(scene, tables, MatParams(scene, m1, uv), vi, vr)
    f2 = _eval_base(scene, tables, MatParams(scene, m2, uv), vi, vr)
    return jnp.where(is_mix[..., None], f1 * amt + f2 * (1.0 - amt), base)


def _sample_base(scene, tables, p: MatParams, vi, u2):
    """All-lobes sample, selected by type.
    Returns (dir, throughput, may_leak)."""
    viz = vi[..., 2]
    up = viz > 0.0

    cos_dir = warps.to_hemisphere_cosine_z(u2)

    # Diffuse
    d_diffuse = jnp.where(up[..., None], cos_dir,
                          jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]),
                                           cos_dir.shape))
    t_diffuse = jnp.where(up[..., None], p.diffuse, 0.0)

    # Mirror / transparent
    d_mirror = vm.reflect_z(vi)
    d_transparent = -vi

    # Dielectric (bxdf.cpp:380-408): reflect w.p. R else refract;
    # the decision consumes u2.x via DecideAndRescale.
    eta = jnp.where(viz < 0.0, p.ior, 1.0 / p.ior)
    r_p, cos_t = _fresnel_dielectric(eta, jnp.abs(viz))
    take_refl, _ = warps.decide_and_rescale(u2[..., 0], r_p)
    d_refr = jnp.stack([
        -vi[..., 0] * eta,
        -vi[..., 1] * eta,
        jnp.where(viz > 0.0, -jnp.abs(cos_t), jnp.abs(cos_t))], axis=-1)
    d_dielectric = jnp.where(take_refl[..., None], d_mirror, d_refr)
    leak_dielectric = ~take_refl

    # LTC specular lobe
    d_ltc = ltc_ops.sample(tables, p.ltc_kind, vi, p.roughness, cos_dir)
    ltc_ok = d_ltc[..., 2] > 0.0
    t_ltc = jnp.where(ltc_ok[..., None], p.specular, 0.0)

    # LTC + diffuse: lobe choice by relative albedo power
    # (bxdf.hpp BxDFLTCDiffuse::sample:137-158)
    dpow = p.diffuse.sum(axis=-1)
    spow = p.specular.sum(axis=-1)
    p_diff = dpow / (dpow + spow + 1e-4)
    take_diff, sx = warps.decide_and_rescale(u2[..., 0], p_diff)
    u2_rescaled = jnp.stack([sx, u2[..., 1]], axis=-1)
    cos_dir_r = warps.to_hemisphere_cosine_z(u2_rescaled)
    d_ltc_r = ltc_ops.sample(tables, p.ltc_kind, vi, p.roughness, cos_dir_r)
    ltc_r_ok = d_ltc_r[..., 2] > 0.0
    d_ltcdiff = jnp.where(take_diff[..., None],
                          jnp.where(up[..., None], cos_dir_r,
                                    jnp.broadcast_to(
                                        jnp.asarray([0.0, 1.0, 0.0]),
                                        cos_dir_r.shape)),
                          d_ltc_r)
    t_ltcdiff = jnp.where(
        take_diff[..., None],
        jnp.where(up[..., None], p.diffuse, 0.0),
        jnp.where(ltc_r_ok[..., None], p.specular, 0.0))

    t = p.bxdf_type[..., None]
    tt = p.bxdf_type
    d = jnp.where(t == BSDF_DIFFUSE, d_diffuse, 0.0)
    thr = jnp.where(t == BSDF_DIFFUSE, t_diffuse, 0.0)
    d = jnp.where(t == BSDF_MIRROR, d_mirror, d)
    thr = jnp.where(t == BSDF_MIRROR, p.specular, thr)
    d = jnp.where(t == BSDF_TRANSPARENT, d_transparent, d)
    thr = jnp.where(t == BSDF_TRANSPARENT, jnp.ones_like(thr), thr)
    d = jnp.where(t == BSDF_DIELECTRIC, d_dielectric, d)
    thr = jnp.where(t == BSDF_DIELECTRIC, p.specular, thr)
    is_ltc = (tt == BSDF_LTC_BECKMANN) | (tt == BSDF_LTC_GGX)
    d = jnp.where(is_ltc[..., None], d_ltc, d)
    thr = jnp.where(is_ltc[..., None], t_ltc, thr)
    is_ltcd = (tt == BSDF_LTC_BECKMANN_DIFFUSE) | (tt == BSDF_LTC_GGX_DIFFUSE)
    d = jnp.where(is_ltcd[..., None], d_ltcdiff, d)
    thr = jnp.where(is_ltcd[..., None], t_ltcdiff, thr)

    leak = (tt == BSDF_TRANSPARENT) \
        | ((tt == BSDF_DIELECTRIC) & leak_dielectric)
    return vm.safe_normalize(d), thr, leak


def sample_bxdf(scene, mat_id, vi, uv, u2, tables=None):
    """Sample an outgoing direction.  Returns (dir, throughput, leak);
    handles one-level mixes with the reference's sample-reuse split."""
    if tables is None:
        tables = ltc_ops.load_tables()
    m = scene.materials
    is_mix = m.bxdf_type[mat_id] == BSDF_MIX
    amt = m.mix_amt[mat_id]
    take_m1, sx = warps.decide_and_rescale(u2[..., 0], amt)
    u2_mix = jnp.stack([sx, u2[..., 1]], axis=-1)
    # Non-mix lanes keep the original sample; mix lanes the rescaled.
    u2_eff = jnp.where(is_mix[..., None], u2_mix, u2)
    sub_id = jnp.where(is_mix,
                       jnp.where(take_m1, m.mix_m1[mat_id], m.mix_m2[mat_id]),
                       mat_id)
    p = MatParams(scene, sub_id, uv)
    return _sample_base(scene, tables, p, vi, u2_eff)
