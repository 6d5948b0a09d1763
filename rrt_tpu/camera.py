"""Thin-lens look-at camera as a differentiable pytree.

Covers the reference camera exactly (reference: src/camera.rs:31-66): vertical
fov, aspect, aperture (defocus disc), focus distance and a shutter interval
for motion blur. Unlike the reference, the camera here is a *parameter pytree*
— the basis/corner quantities are derived inside the traced function so
gradients flow to every creation parameter (the north-star requires grads
w.r.t. camera parameters).

`generate_rays` is fully batched: it maps a batch of pixel coordinates and a
sample index to a structure-of-arrays ray batch in one shot.
"""

import dataclasses

import jax
import jax.numpy as jnp

from . import rng
from .vec import V3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Creation parameters; all fields are differentiable f32 leaves."""

    look_from: jax.Array  # (3,)
    look_at: jax.Array  # (3,)
    up: jax.Array  # (3,)
    fov_deg: jax.Array  # () vertical field of view in degrees
    aspect: jax.Array  # () width / height
    aperture: jax.Array  # ()
    focus_dist: jax.Array  # ()
    time0: jax.Array  # () shutter open
    time1: jax.Array  # () shutter close

    @staticmethod
    def create(look_from, look_at, up=(0.0, 1.0, 0.0), fov_deg=20.0,
               aspect=1.5, aperture=0.0, focus_dist=1.0, time0=0.0,
               time1=0.0) -> "Camera":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return Camera(
            look_from=f32(look_from), look_at=f32(look_at), up=f32(up),
            fov_deg=f32(fov_deg), aspect=f32(aspect), aperture=f32(aperture),
            focus_dist=f32(focus_dist), time0=f32(time0), time1=f32(time1))

    def basis(self):
        """Derived frame: (origin, lower_left, horizontal, vertical, u, v)."""
        theta = self.fov_deg * (jnp.pi / 180.0)
        half_h = jnp.tan(theta * 0.5)
        half_w = self.aspect * half_h
        w = _normalize(self.look_from - self.look_at)
        u = _normalize(jnp.cross(self.up, w))
        v = jnp.cross(w, u)
        fd = self.focus_dist
        lower_left = (self.look_from - half_w * fd * u - half_h * fd * v
                      - fd * w)
        horizontal = (2.0 * half_w * fd) * u
        vertical = (2.0 * half_h * fd) * v
        return self.look_from, lower_left, horizontal, vertical, u, v


def _normalize(x):
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))


def generate_rays(camera: Camera, px: jax.Array, py: jax.Array,
                  width: int, height: int, keys: jax.Array):
    """Generate one jittered camera ray per pixel in the batch.

    px, py: integer pixel coordinates, shape (N,). py follows image
    convention (row 0 = top); the y-flip into camera `t` happens here, like
    the reference's flip at src/lib.rs:93-94.

    keys: per-lane sample keys from rng.sample_keys — each ray's jitter,
    lens offset and shutter time are a pure function of its
    (seed, pixel, sample) identity.
    Returns (origins V3, directions V3, times (N,)) in component-SoA form.
    """
    jx, jy, dcx, dcy, time_u = rng.camera_draws(keys)
    s = (px.astype(jnp.float32) + jx) / jnp.float32(width)
    t = ((jnp.float32(height - 1) - py.astype(jnp.float32)) + jy) \
        / jnp.float32(height)

    origin, lower_left, horizontal, vertical, u, v = camera.basis()

    lens_radius = camera.aperture * 0.5
    rdx = lens_radius * dcx  # (N,)
    rdy = lens_radius * dcy
    uu = V3(u[0], u[1], u[2])
    vv = V3(v[0], v[1], v[2])
    org = V3(origin[0], origin[1], origin[2])
    ll = V3(lower_left[0], lower_left[1], lower_left[2])
    hor = V3(horizontal[0], horizontal[1], horizontal[2])
    ver = V3(vertical[0], vertical[1], vertical[2])

    origins = org + uu * rdx + vv * rdy
    directions = ll + hor * s + ver * t - origins
    times = camera.time0 + (camera.time1 - camera.time0) * time_u
    return origins, directions, times
