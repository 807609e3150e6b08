"""Pinhole / thin-lens camera as a JAX pytree.

Behavioral parity with the reference camera (reference src/camera.cpp):
the view screen is a world-space rectangle at `focus_plane` distance,
anchored at its corner; image x runs left->right, image y runs
top->bottom (the reference's double-cross basis construction yields a
downward 'up' vector — we precompute the same final basis directly).
Also provides the inverse projection used to splat light-tracing
contributions (camera.cpp GetCoordsFromDirection).
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import vecmath as vm
from ..ops import warps

_ARRAY_FIELDS = ("origin", "viewscreen", "viewscreen_x", "viewscreen_y",
                 "cameraleft", "cameraup", "direction", "lens_size")


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Camera:
    origin: jnp.ndarray        # [3]
    viewscreen: jnp.ndarray    # [3] corner of the view rectangle
    viewscreen_x: jnp.ndarray  # [3] full-width edge vector (image +x)
    viewscreen_y: jnp.ndarray  # [3] full-height edge vector (image +y)
    cameraleft: jnp.ndarray    # [3] lens-plane basis
    cameraup: jnp.ndarray      # [3] lens-plane basis
    direction: jnp.ndarray     # [3] forward
    lens_size: jnp.ndarray     # [] scalar; 0 => pinhole
    # Static aux data (not traced): resolution and the pinhole flag
    # decide code structure, so they must be concrete under jit.
    xres: int = 0
    yres: int = 0
    is_simple: bool = True

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in _ARRAY_FIELDS)
        aux = (self.xres, self.yres, self.is_simple)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, xres=aux[0], yres=aux[1], is_simple=aux[2])


def make_camera(position, lookat, up, yview: float, xview: float,
                xres: int, yres: int, focus_plane: float = 1.0,
                lens_size: float = 0.0) -> Camera:
    """Build the camera basis (camera.cpp:7-24)."""
    position = np.asarray(position, np.float64)
    lookat = np.asarray(lookat, np.float64)
    up = np.asarray(up, np.float64)

    direction = lookat - position
    direction = direction / np.linalg.norm(direction)
    cameraleft = np.cross(up, direction)
    cameraleft /= np.linalg.norm(cameraleft)
    cameraup = np.cross(cameraleft, direction)
    cameraup /= np.linalg.norm(cameraup)

    viewscreen_x = -xview * cameraleft * focus_plane
    viewscreen_y = yview * cameraup * focus_plane
    viewscreen = (position + direction * focus_plane
                  - 0.5 * viewscreen_y - 0.5 * viewscreen_x)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return Camera(
        origin=f32(position),
        viewscreen=f32(viewscreen),
        viewscreen_x=f32(viewscreen_x),
        viewscreen_y=f32(viewscreen_y),
        cameraleft=f32(cameraleft),
        cameraup=f32(cameraup),
        direction=f32(direction),
        lens_size=f32(lens_size),
        xres=int(xres),
        yres=int(yres),
        is_simple=(float(lens_size) == 0.0),
    )


def pixel_rays(cam: Camera, px, py, jitter, lens_sample=None):
    """Primary rays for lanes of pixels.

    px, py: int32[...]; jitter: f32[..., 2] subpixel offset in [0,1)^2;
    lens_sample: optional f32[..., 2] for the thin-lens model
    (camera.cpp GetPixelRay / GetPixelRayLens).
    Returns (origins[...,3], directions[...,3] normalized).
    """
    fx = (px.astype(jnp.float32) + jitter[..., 0]) / cam.xres
    fy = (py.astype(jnp.float32) + jitter[..., 1]) / cam.yres
    p = (cam.viewscreen
         + fx[..., None] * cam.viewscreen_x
         + fy[..., None] * cam.viewscreen_y)
    if lens_sample is None:
        o = jnp.broadcast_to(cam.origin, p.shape)
    else:
        lens = warps.to_disc_uniform(lens_sample) * cam.lens_size
        o = (cam.origin
             + lens[..., 0:1] * cam.cameraleft
             + lens[..., 1:2] * cam.cameraup)
    return o, vm.normalize(p - o)


def coords_from_direction(cam: Camera, dirs):
    """Inverse projection: world direction (from camera origin) ->
    (x, y, in_view) pixel coords; used by light-tracing splats
    (camera.cpp:48-83).

    Returns (x: int32[...], y: int32[...], in_view: bool[...]).
    """
    n = cam.direction
    q = vm.dot(dirs, n)
    t = vm.dot(cam.viewscreen - cam.origin, n) / jnp.where(
        jnp.abs(q) > 1e-12, q, 1e-12)
    p = cam.origin + dirs * t[..., None]
    vp = p - cam.viewscreen
    x_ratio = vm.dot(vp, cam.viewscreen_x) / vm.dot(
        cam.viewscreen_x, cam.viewscreen_x)
    y_ratio = vm.dot(vp, cam.viewscreen_y) / vm.dot(
        cam.viewscreen_y, cam.viewscreen_y)
    in_view = ((q >= 1e-4) & (t > 0)
               & (x_ratio >= 0.0) & (x_ratio <= 1.0)
               & (y_ratio >= 0.0) & (y_ratio <= 1.0))
    x = jnp.clip((cam.xres * x_ratio).astype(jnp.int32), 0, cam.xres - 1)
    y = jnp.clip((cam.yres * y_ratio).astype(jnp.int32), 0, cam.yres - 1)
    return x, y, in_view
