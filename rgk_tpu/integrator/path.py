"""Wavefront path tracing: the reference's recursive megakernel
re-shaped for a vector machine.

The reference traces one pixel at a time through a serial bounce loop
with early exits (reference src/path_tracer.cpp GeneratePath/TracePath).
Here a *wavefront* of lanes — one per (pixel, sample) pair — advances
through a `lax.scan` over bounce index; termination (russian roulette,
throughput cutoff, light leaks, sky escape) is a per-lane `alive` mask
update, never control flow.  All physics matches the reference:

* per-path single light sample used for NEE at every vertex
  (path_tracer.cpp:322-325);
* per-vertex radiance = NEE + emission, clamped, times the cumulative
  contribution *before* this vertex (path_tracer.cpp:427-496);
* russian roulette from vertex 2 with 1/p compensation at the *next*
  vertex (path_tracer.cpp:265-285);
* throughput cutoff at max < 1e-3; light-leak guard terminating the
  path after shading the vertex (path_tracer.cpp:251-260);
* next-ray origin offset +-10*eps along the geometric-interpolated
  normal (path_tracer.cpp:291-295);
* sky escape adds envmap radiance evaluated at -ray_dir
  (path_tracer.cpp:409-415).

Differentiability: traversal outputs (hit ids, t, barycentrics) are
integer/stop-gradient; radiance is smooth in material colors,
emission, roughness, textures, light intensity, and sky.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bxdf as bxdf_ops
from ..ops import intersect as isect
from ..ops import lights as light_ops
from ..ops import ltc as ltc_ops
from ..ops import sampler as smp
from ..ops import textures as tex_ops
from ..ops import vecmath as vm
from ..scene.camera import pixel_rays

RAY_FAR = 10000.0  # the reference Ray's default far plane (ray.hpp:26)


class TraceResult(NamedTuple):
    radiance: jnp.ndarray  # f32 [R,3] per-lane radiance estimate
    rays: jnp.ndarray      # int32 [] extension rays traced (counter
    #                        parity: visibility rays excluded,
    #                        path_tracer.cpp:126)


def _interp(attr, vidx, ba, bb, bc):
    return (ba[..., None] * attr[vidx[..., 0]]
            + bb[..., None] * attr[vidx[..., 1]]
            + bc[..., None] * attr[vidx[..., 2]])


def trace_wavefront(scene, meta, settings, cam, ctx, px, py) -> TraceResult:
    """Trace one eye path per lane.  ctx: SampleCtx; px/py int32 [R]."""
    tables = ltc_ops.load_tables()
    intersect = isect.make_intersector(meta)
    depth = int(settings.recursion_max)
    russian = float(settings.russian)
    clamp = float(settings.clamp)
    bump_scale = float(settings.bumpmap_scale)

    jitter = smp.sample_2d(ctx, smp.DIM_PIXEL_JITTER)
    if cam.is_simple:
        ro, rd = pixel_rays(cam, px, py, jitter)
    else:
        ro, rd = pixel_rays(cam, px, py, jitter,
                            lens_sample=smp.sample_2d(ctx, smp.DIM_LENS))

    # One light per path (path_tracer.cpp:315-325).
    areal2 = smp.sample_2d(ctx, smp.DIM_AREAL)
    _lightdir2 = smp.sample_2d(ctx, smp.DIM_LIGHTDIR)  # light subpath dir
    choice2 = smp.sample_2d(ctx, smp.DIM_LIGHT_CHOICE)
    light1 = smp.sample_1d(ctx, smp.DIM_LIGHT_TRI)
    light = light_ops.sample_light(scene, choice2, light1, areal2)
    light = light_ops.offset_sphere_light(light, areal2)

    R = ro.shape[0]

    def bounce(carry, bounce_idx):
        ro, rd, last_tri, contribution, alive, radiance, ray_count = carry

        hit = intersect(scene, ro, rd, 0.0, RAY_FAR, exclude=last_tri)
        ray_count = ray_count + jnp.sum(alive.astype(jnp.int32))

        # --- Sky escape (Vr = -rd convention, path_tracer.cpp:409) ---
        sky_mask = alive & ~hit.valid
        sky = tex_ops.sky_radiance(scene, -rd)
        radiance = radiance + jnp.where(sky_mask[..., None],
                                        contribution * sky, 0.0)

        act = alive & hit.valid
        tri = jnp.maximum(hit.tri, 0)
        vidx = scene.tri_vidx[tri]
        mat_id = scene.tri_mat[tri]
        ba = 1.0 - hit.bary_b - hit.bary_c
        pos = ro + rd * hit.t[..., None]
        vr = -rd

        face_n_raw = _interp(scene.normals, vidx, ba, hit.bary_b, hit.bary_c)
        n_len2 = vm.dot(face_n_raw, face_n_raw)
        n_ok = n_len2 > 0.0  # zero/NaN normals kill the lane
        face_n = vm.safe_normalize(face_n_raw)
        uv = (ba[..., None] * scene.uvs[vidx[..., 0]]
              + hit.bary_b[..., None] * scene.uvs[vidx[..., 1]]
              + hit.bary_c[..., None] * scene.uvs[vidx[..., 2]])
        act = act & n_ok

        emission = scene.materials.emission[mat_id]
        no_russian = scene.materials.no_russian[mat_id]

        # --- Bump mapping (path_tracer.cpp:204-231) ---
        light_n = face_n
        if meta.has_textures:
            bump_tex = scene.materials.bump_tex[mat_id]
            has_bump = bump_tex >= 0
            s_right, s_bottom = tex_ops.bump_slopes(
                scene.textures, jnp.maximum(bump_tex, 0), uv)
            tangent = _interp(scene.tangents, vidx, ba, hit.bary_b,
                              hit.bary_c)
            t_ok = vm.dot(tangent, tangent) >= 1e-3
            tangent = vm.safe_normalize(tangent)
            bitangent = vm.safe_normalize(jnp.cross(face_n, tangent))
            tangent2 = jnp.cross(bitangent, face_n)
            tilted = vm.safe_normalize(
                face_n + (tangent2 * s_right[..., None]
                          + bitangent * s_bottom[..., None]) * bump_scale,
                fallback=face_n)
            light_n = jnp.where((has_bump & t_ok)[..., None], tilted, face_n)

        # --- Shading frame & BxDF sample ---
        t_f, b_f = vm.build_onb(light_n)
        vr_local = vm.to_local(light_n, t_f, b_f, vr)
        # Per-bounce sample dims: the bounce index is a traced scan
        # value, so instead of a static dim offset we fold it into the
        # seed and use the hash sampler for bounce dims (first-bounce
        # dims 0..10 stay low-discrepancy, which is where QMC pays).
        bctx = ctx._replace(
            seed=smp.hash_u32(ctx.seed, bounce_idx + jnp.uint32(1)),
            mode=0)
        u2 = smp.sample_2d(bctx, smp.DIM_EYE_BOUNCE)
        rr_u = smp.sample_1d(bctx, smp.DIM_EYE_BOUNCE + 2)

        dir_local, transfer, may_leak = bxdf_ops.sample_bxdf(
            scene, mat_id, vr_local, uv, u2, tables)
        inside = dir_local[..., 2] < 0.0
        dir_world = vm.to_global(light_n, t_f, b_f, dir_local)

        # Light-leak guard (path_tracer.cpp:251-260): shade this vertex
        # but terminate after it.
        same_sign = (vm.dot(dir_world, face_n) * vm.dot(vr, face_n)) > 0.0
        leak_kill = ~same_sign & ~may_leak

        # --- NEE: direct light (path_tracer.cpp:427-460) ---
        to_light = light.pos - pos
        dist2 = jnp.maximum(vm.dot(to_light, to_light), 1e-12)
        vi_l = to_light / jnp.sqrt(dist2)[..., None]
        vis = isect.visibility(scene, intersect, light.pos, pos)
        f = bxdf_ops.eval_bxdf(scene, mat_id,
                               vm.to_local(light_n, t_f, b_f, vi_l),
                               vr_local, uv, tables)
        g = jnp.abs(vm.dot(light_n, vi_l)) / dist2
        inc = (light.color * light.intensity[..., None]
               * light.directional_factor(-vi_l)[..., None])
        direct = jnp.where((vis & light.valid)[..., None],
                           inc * f * g[..., None], 0.0)

        # --- Emission (front side only, path_tracer.cpp:485-487) ---
        front = vm.dot(face_n, vr) > 0.0
        emit = jnp.where(front[..., None], emission, 0.0)

        total_here = jnp.minimum(direct + emit, clamp)
        radiance = radiance + jnp.where(act[..., None],
                                        contribution * total_here, 0.0)

        # --- Path continuation (path_tracer.cpp:263-295) ---
        vertex_n = bounce_idx + 1  # 1-based vertex index
        rus_coeff = jnp.where(
            (~no_russian) & (russian > 0.0) & (vertex_n > 1),
            1.0 / russian if russian > 0.0 else 1.0, 1.0)
        new_contribution = jnp.where(
            act[..., None],
            contribution * rus_coeff[..., None] * transfer,
            contribution)
        cum_low = new_contribution.max(axis=-1) < 1e-3
        rr_kill = (~no_russian) & (russian >= 0.0) & (rr_u > russian)
        alive = act & ~cum_low & ~rr_kill & ~leak_kill

        offset = (scene.epsilon * 10.0
                  * jnp.where(inside, -1.0, 1.0))[..., None] * face_n
        new_ro = jnp.where(act[..., None], pos + offset, ro)
        new_rd = jnp.where(act[..., None], vm.safe_normalize(dir_world), rd)
        new_last = jnp.where(act, hit.tri, last_tri)

        return (new_ro, new_rd, new_last, new_contribution, alive,
                radiance, ray_count), None

    init = (
        ro, rd,
        jnp.full((R,), -1, jnp.int32),
        jnp.ones((R, 3), jnp.float32),
        jnp.ones((R,), bool),
        jnp.zeros((R, 3), jnp.float32),
        jnp.zeros((), jnp.int32),
    )
    (ro_f, rd_f, _, _, alive_f, radiance, ray_count), _ = jax.lax.scan(
        bounce, init, jnp.arange(depth, dtype=jnp.uint32))

    # Final clamp + NaN/negative scrub (path_tracer.cpp:502-507).
    radiance = jnp.minimum(radiance, clamp)
    radiance = jnp.where(jnp.isnan(radiance) | (radiance < 0.0), 0.0,
                         radiance)
    return TraceResult(radiance=radiance, rays=ray_count)


def render_lanes(scene, meta, settings, cam, px, py, sample_idx, seed,
                 sampler_mode: int = 1):
    """Render a batch of lanes: px/py int32 [R], sample_idx uint32 [R]
    (globally unique per round x multisample), seed uint32 scalar."""
    pixel_id = (py.astype(jnp.uint32) * jnp.uint32(cam.xres)
                + px.astype(jnp.uint32))
    ctx = smp.SampleCtx(seed=jnp.uint32(seed), pixel=pixel_id,
                        sample=sample_idx.astype(jnp.uint32),
                        mode=sampler_mode)
    return trace_wavefront(scene, meta, settings, cam, ctx, px, py)


def render_image_round(scene, meta, settings, cam, round_idx: int,
                       seed: int = 42, sampler_mode: int = 1):
    """Render one full round (all pixels x multisample) on the current
    device.  Returns (radiance_sum [H,W,3], counts [H,W], rays int).

    Intended for small/medium images; the driver chunks larger frames.
    """
    xres, yres = cam.xres, cam.yres
    ms = int(settings.multisample)
    yy, xx = jnp.meshgrid(jnp.arange(yres, dtype=jnp.int32),
                          jnp.arange(xres, dtype=jnp.int32), indexing="ij")
    px = jnp.tile(xx.reshape(-1), ms)
    py = jnp.tile(yy.reshape(-1), ms)
    s_local = jnp.repeat(jnp.arange(ms, dtype=jnp.uint32), xres * yres)
    # Round-unique global sample index drives progressive refinement.
    sample_idx = s_local + jnp.uint32(round_idx * ms)

    result = render_lanes(scene, meta, settings, cam, px, py, sample_idx,
                          seed, sampler_mode)
    rad = result.radiance.reshape(ms, yres, xres, 3).sum(axis=0)
    counts = jnp.full((yres, xres), ms, jnp.float32)
    return rad, counts, result.rays
