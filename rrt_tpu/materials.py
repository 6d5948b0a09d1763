"""Branchless batched material scatter.

The reference dispatches `Material::scatter` through a vtable per ray
(reference: src/materials.rs:5-7). With only five material models, the
TPU-native form computes *all* responses for the whole batch and selects by
material id — far cheaper on a lockstep vector machine than any divergence
machinery, and exactly what the VPU is built for.

Semantics mirror the books (and the reference where it has the material):
  lambertian  dir = n + unit_vector, degenerate -> n     (materials.rs:19-35)
  metal       dir = reflect(unit(d), n) + fuzz*in_sphere,
              absorbed if dir.n <= 0                     (materials.rs:44-61)
  dielectric  Schlick reflectance, TIR, stochastic
              reflect-vs-refract, attenuation = 1        (materials.rs:75-104)
  diffuse_light  emits tex(u,v,p), never scatters        (RTTNW ch. 7)
  isotropic   dir = in_unit_sphere                       (RTTNW ch. 9)

Scattered rays inherit the incoming ray's time (materials.rs:30,53,99) — the
caller keeps `time` unchanged across bounces.
"""

import dataclasses

import jax
import jax.numpy as jnp

from . import rng
from .scene import (MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC,
                    MAT_LAMBERTIAN, MAT_METAL, SceneArrays)
from .textures import texture_value


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scatter:
    direction: jax.Array  # (N,3) new ray direction
    attenuation: jax.Array  # (N,3)
    emitted: jax.Array  # (N,3)
    scattered: jax.Array  # (N,) bool — False = absorbed / pure emitter


def _normalize(x):
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))


def _reflect(v, n):
    return v - 2.0 * jnp.sum(v * n, axis=-1, keepdims=True) * n


def _refract(unit_d, n, ratio):
    """Snell refraction of a unit direction about unit normal n.

    Double-where keeps the sqrt gradient finite at the total-internal-
    reflection boundary (r_par_sq -> 0), where this branch is masked out
    by the caller anyway."""
    cos_theta = jnp.minimum(-jnp.sum(unit_d * n, axis=-1, keepdims=True),
                            1.0)
    r_perp = ratio[:, None] * (unit_d + cos_theta * n)
    r_par_sq = 1.0 - jnp.sum(r_perp * r_perp, axis=-1, keepdims=True)
    ok = r_par_sq > 1e-12
    r_par = -jnp.sqrt(jnp.where(ok, r_par_sq, 1.0)) * n * ok
    return r_perp + r_par


def _schlick(cosine, ref_idx):
    r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def scatter(scene: SceneArrays, d_in, hit, keys, bounce) -> Scatter:
    """Evaluate all material models for the batch and select by mat_id.

    d_in: (N,3) incoming ray directions (unnormalized, like the reference).
    hit: geometry.Hit for this batch.
    keys: per-lane sample keys (rng.sample_keys); bounce: per-lane or
    scalar bounce counter for the draw stream.
    """
    n_rays = d_in.shape[0]
    mtype = scene.mat_type[hit.mat_id]  # (N,)
    albedo = texture_value(scene, scene.mat_tex[hit.mat_id],
                           hit.uv[:, 0], hit.uv[:, 1], hit.p)

    unit_rand, sphere_rand, u_choice = rng.scatter_draws(keys, bounce)

    normal = hit.normal

    # Lambertian.
    lam_dir = normal + unit_rand
    lam_degenerate = jnp.all(jnp.abs(lam_dir) < 1e-8, axis=-1)
    lam_dir = jnp.where(lam_degenerate[:, None], normal, lam_dir)

    # Metal.
    unit_d = _normalize(d_in)
    fuzz = scene.mat_fuzz[hit.mat_id]
    met_dir = _reflect(unit_d, normal) + fuzz[:, None] * sphere_rand
    met_ok = jnp.sum(met_dir * normal, axis=-1) > 0.0

    # Dielectric.
    ior = scene.mat_ior[hit.mat_id]
    ratio = jnp.where(hit.front_face, 1.0 / ior, ior)
    cos_theta = jnp.minimum(-jnp.sum(unit_d * normal, axis=-1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = ratio * sin_theta > 1.0
    # The reflect-vs-refract *decision* is discrete: detach it so its
    # (measure-zero) boundary contributes no gradient — path-replay
    # detached sampling (SURVEY.md §7 design stance).
    reflect_choice = jax.lax.stop_gradient(
        cannot_refract | (_schlick(cos_theta, ratio) > u_choice))
    die_dir = jnp.where(reflect_choice[:, None], _reflect(unit_d, normal),
                        _refract(unit_d, normal, ratio))

    is_lam = mtype == MAT_LAMBERTIAN
    is_met = mtype == MAT_METAL
    is_die = mtype == MAT_DIELECTRIC
    is_iso = mtype == MAT_ISOTROPIC

    direction = jnp.where(
        is_lam[:, None], lam_dir,
        jnp.where(is_met[:, None], met_dir,
                  jnp.where(is_die[:, None], die_dir, sphere_rand)))
    attenuation = jnp.where(is_die[:, None], jnp.float32(1.0), albedo)

    if scene.has_emissive:
        is_light = mtype == MAT_DIFFUSE_LIGHT
        emitted = jnp.where(is_light[:, None], albedo, jnp.float32(0.0))
    else:
        emitted = jnp.zeros((n_rays, 3), jnp.float32)

    scattered = jnp.where(is_met, met_ok, is_lam | is_die | is_iso)
    return Scatter(direction=direction, attenuation=attenuation,
                   emitted=emitted, scattered=scattered)
