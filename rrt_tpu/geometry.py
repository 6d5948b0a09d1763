"""Batched ray-primitive intersection in matmul form.

The reference intersects one ray against one primitive at a time through a
trait object (reference: src/sphere.rs:68-101, src/hittable.rs:5-8). The
TPU-native formulation tests a whole ray batch against a whole primitive
family at once, and is deliberately algebraically rearranged so the O(N*S)
inner products become (N,3)x(3,S) matmuls that land on the MXU:

  sphere:  half_b = o.d - d.c(t),  c_coef = |o|^2 - 2 o.c(t) + |c(t)|^2 - r^2
           with  x.c(t) = x.c0 + f(t) * x.dc   (two matmuls per x)
  quad:    t = (n.Q - n.o)/(n.d),  alpha = (p-Q).g,  beta = (p-Q).h
           with p.g = o.g + t (d.g)            (all six are matmuls)

Only the winning primitive's full hit record is reconstructed afterwards
(`make_hit`), so per-pair work stays at a handful of fused elementwise ops.

All selects use the double-where pattern so reverse-mode gradients stay
finite at degenerate configurations (grazing rays, zero discriminants).
"""

import dataclasses

import jax
import jax.numpy as jnp

from .scene import BOUND_SPHERE, SceneArrays

INF = 3.0e38  # python float: no device constant at import time
T_MIN_DEFAULT = 1.0e-3

FAM_NONE = -1
FAM_SPHERE = 0
FAM_QUAD = 1
FAM_MEDIUM = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """SoA hit record for a ray batch (the reference's `Hit` struct,
    src/hittable.rs:10-16, plus texture uv and integer ids instead of a
    material reference)."""

    t: jax.Array  # (N,)
    p: jax.Array  # (N,3)
    normal: jax.Array  # (N,3) faces against the incoming ray
    front_face: jax.Array  # (N,) bool
    mat_id: jax.Array  # (N,) i32
    uv: jax.Array  # (N,2)
    hit_mask: jax.Array  # (N,) bool


def _safe_sqrt(x):
    return jnp.sqrt(jnp.where(x > 0.0, x, 1.0)) * (x > 0.0)


def _safe_div(a, b, eps=1e-20):
    bb = jnp.where(jnp.abs(b) > eps, b, jnp.float32(1.0))
    return jnp.where(jnp.abs(b) > eps, a / bb, jnp.float32(0.0))


def intersect_spheres(scene: SceneArrays, o, d, time, t_min, t_max):
    """Closest valid sphere per ray.

    Returns (t (N,), idx (N,) i32). Misses have t == INF.
    Root selection matches the reference (src/sphere.rs:79-87): take the near
    root if inside (t_min, t_max), else the far root, else miss. Negative
    radii participate normally (|r| bounds the surface; the sign only flips
    the outward normal, handled in `make_hit`).
    """
    c0t = scene.sphere_c0.T  # (3,S)
    dct = scene.sphere_dc.T

    # f(t): per-(ray, sphere) motion interpolant. sphere_inv_dt is 0 for
    # stationary spheres, collapsing the moving terms.
    f = (time[:, None] - scene.sphere_t0[None, :]) \
        * scene.sphere_inv_dt[None, :]  # (N,S)

    o_c0 = o @ c0t  # (N,S) MXU
    o_dc = o @ dct
    d_c0 = d @ c0t
    d_dc = d @ dct

    a = jnp.sum(d * d, axis=-1)  # (N,)
    o_dot_d = jnp.sum(o * d, axis=-1)
    o_dot_o = jnp.sum(o * o, axis=-1)

    # Per-sphere motion scalars.
    c0_sq = jnp.sum(scene.sphere_c0 ** 2, axis=-1)  # (S,)
    c0_dc = jnp.sum(scene.sphere_c0 * scene.sphere_dc, axis=-1)
    dc_sq = jnp.sum(scene.sphere_dc ** 2, axis=-1)
    r_sq = scene.sphere_radius ** 2

    d_c = d_c0 + f * d_dc  # d . c(t)
    o_c = o_c0 + f * o_dc  # o . c(t)
    c_sq = c0_sq[None, :] + 2.0 * f * c0_dc[None, :] + f * f * dc_sq[None, :]

    half_b = o_dot_d[:, None] - d_c
    c_coef = o_dot_o[:, None] - 2.0 * o_c + c_sq - r_sq[None, :]
    disc = half_b * half_b - a[:, None] * c_coef
    sq = _safe_sqrt(disc)
    inv_a = (1.0 / a)[:, None]
    root0 = (-half_b - sq) * inv_a
    root1 = (-half_b + sq) * inv_a

    ok = (disc > 0.0) & scene.sphere_valid[None, :]
    in0 = ok & (root0 > t_min[:, None]) & (root0 < t_max[:, None])
    in1 = ok & (root1 > t_min[:, None]) & (root1 < t_max[:, None])
    t_hit = jnp.where(in0, root0, jnp.where(in1, root1, INF))

    idx = jnp.argmin(t_hit, axis=-1).astype(jnp.int32)
    t_best = jnp.min(t_hit, axis=-1)
    return t_best, idx


def _quad_frames(scene: SceneArrays):
    """Derived per-quad vectors (computed in-trace so geometry grads flow)."""
    n = jnp.cross(scene.quad_u, scene.quad_v)  # (Q,3)
    nn = jnp.sum(n * n, axis=-1, keepdims=True)  # (Q,1)
    inv_nn = 1.0 / jnp.maximum(nn, 1e-20)
    g = jnp.cross(scene.quad_v, n) * inv_nn  # alpha = (p-Q).g
    h = jnp.cross(n, scene.quad_u) * inv_nn  # beta  = (p-Q).h
    return n, g, h, jnp.sqrt(jnp.maximum(nn, 1e-20))[:, 0]


def intersect_quads(scene: SceneArrays, o, d, t_min, t_max):
    """Closest valid parallelogram per ray. Returns (t, idx)."""
    n, g, h, n_norm = _quad_frames(scene)
    d_plane = jnp.sum(n * scene.quad_q, axis=-1)  # (Q,)
    q_g = jnp.sum(g * scene.quad_q, axis=-1)
    q_h = jnp.sum(h * scene.quad_q, axis=-1)

    o_n = o @ n.T  # (N,Q) MXU
    d_n = d @ n.T
    o_g = o @ g.T
    d_g = d @ g.T
    o_h = o @ h.T
    d_h = d @ h.T

    # Parallel rays: |n_unit . d| < 1e-8  <=>  |d_n| < 1e-8 * |n| * |d|.
    d_norm = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20))
    not_parallel = jnp.abs(d_n) > (1e-8 * n_norm[None, :]
                                   * d_norm[:, None])
    t = _safe_div(d_plane[None, :] - o_n, d_n)
    alpha = o_g + t * d_g - q_g[None, :]
    beta = o_h + t * d_h - q_h[None, :]

    ok = (scene.quad_valid[None, :] & not_parallel
          & (t > t_min[:, None]) & (t < t_max[:, None])
          & (alpha >= 0.0) & (alpha <= 1.0)
          & (beta >= 0.0) & (beta <= 1.0))
    t_hit = jnp.where(ok, t, INF)
    idx = jnp.argmin(t_hit, axis=-1).astype(jnp.int32)
    return jnp.min(t_hit, axis=-1), idx


def _medium_interval(scene: SceneArrays, o, d):
    """(t_enter, t_exit, valid) of each ray with each medium boundary over
    the unbounded line, shapes (N,D). Media are few, so this path is plain
    VPU work (no matmul rearrangement needed)."""
    c = scene.med_center  # (D,3)
    oc = o[:, None, :] - c[None, :, :]  # (N,D,3)
    dN = d[:, None, :]

    # Sphere boundary: both quadratic roots.
    a = jnp.sum(d * d, axis=-1)[:, None]  # (N,1)
    half_b = jnp.sum(oc * dN, axis=-1)  # (N,D)
    c_coef = jnp.sum(oc * oc, axis=-1) - (scene.med_radius ** 2)[None, :]
    disc = half_b * half_b - a * c_coef
    sq = _safe_sqrt(disc)
    sph_enter = (-half_b - sq) / a
    sph_exit = (-half_b + sq) / a
    sph_ok = disc > 0.0

    # OBB boundary: slab test in the box frame.
    rot = scene.med_rot  # (D,3,3) world-from-box
    o_box = jnp.einsum("dij,ndj->ndi", jnp.swapaxes(rot, -1, -2), oc)
    d_box = jnp.einsum("dij,nj->ndi", jnp.swapaxes(rot, -1, -2), d)
    inv_d = _safe_div(jnp.ones_like(d_box), d_box, eps=1e-12)
    # Degenerate axes (ray parallel to slab): treat as +/- INF interval when
    # origin inside the slab, else empty.
    h = scene.med_half[None, :, :]
    t1 = (-h - o_box) * inv_d
    t2 = (h - o_box) * inv_d
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    parallel = jnp.abs(d_box) <= 1e-12
    inside = jnp.abs(o_box) <= h
    lo = jnp.where(parallel, jnp.where(inside, -INF, INF), lo)
    hi = jnp.where(parallel, jnp.where(inside, INF, -INF), hi)
    obb_enter = jnp.max(lo, axis=-1)
    obb_exit = jnp.min(hi, axis=-1)
    obb_ok = obb_enter < obb_exit

    is_sphere = (scene.med_btype == BOUND_SPHERE)[None, :]
    t_enter = jnp.where(is_sphere, sph_enter, obb_enter)
    t_exit = jnp.where(is_sphere, sph_exit, obb_exit)
    ok = jnp.where(is_sphere, sph_ok, obb_ok) & scene.med_valid[None, :]
    return t_enter, t_exit, ok


def intersect_media(scene: SceneArrays, o, d, t_min, t_max, u_med):
    """Stochastic constant-medium intersection (RTTNW ch. 9 semantics):
    clamp the boundary interval to [t_min, t_max] (and t >= 0), then sample
    an interaction distance  -log(U)/density  along the ray.

    u_med: (N,D) uniforms for this bounce. Returns (t, idx).
    """
    t_enter, t_exit, ok = _medium_interval(scene, o, d)
    t_enter = jnp.maximum(t_enter, t_min[:, None])
    t_exit = jnp.minimum(t_exit, t_max[:, None])
    ok = ok & (t_enter < t_exit)
    t_enter = jnp.maximum(t_enter, 0.0)
    ok = ok & (t_enter < t_exit)

    d_norm = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20))[:, None]
    dist_inside = (t_exit - t_enter) * d_norm
    # neg_inv_density * log(U) == -log(U)/density  (both negative factors).
    hit_dist = scene.med_neg_inv_density[None, :] * jnp.log(
        jnp.maximum(u_med, 1e-12))
    ok = ok & (hit_dist <= dist_inside)
    t = t_enter + hit_dist / d_norm

    t_hit = jnp.where(ok, t, INF)
    idx = jnp.argmin(t_hit, axis=-1).astype(jnp.int32)
    return jnp.min(t_hit, axis=-1), idx


def merge_solid_medium(scene: SceneArrays, o, d, t_min, t_max, u_med,
                       ts, is_, tq, iq):
    """Merge per-family closest hits into (t, family, idx, hit_mask).

    Media are intersected here against a t_max already shrunk by the
    closest solid hit, matching the books' behavior where a scatter event
    beyond the containing boundary cannot occur."""
    t_solid = jnp.minimum(ts, tq)
    if scene.has_media:
        tm, im = intersect_media(scene, o, d, t_min,
                                 jnp.minimum(t_max, t_solid), u_med)
    else:
        tm = jnp.full_like(ts, INF)
        im = jnp.zeros_like(is_)

    t = jnp.minimum(t_solid, tm)
    fam = jnp.where(
        tm < t_solid, FAM_MEDIUM, jnp.where(ts <= tq, FAM_SPHERE, FAM_QUAD))
    idx = jnp.where(tm < t_solid, im, jnp.where(ts <= tq, is_, iq))
    hit_mask = t < INF
    fam = jnp.where(hit_mask, fam, FAM_NONE).astype(jnp.int32)
    return t, fam, idx, hit_mask


def intersect_all(scene: SceneArrays, o, d, time, t_min, t_max, u_med):
    """Merge closest hits across primitive families (XLA matmul-form path).

    Returns (t (N,), family (N,) i32, idx (N,) i32, hit_mask (N,))."""
    ts, is_ = intersect_spheres(scene, o, d, time, t_min, t_max)
    if scene.has_quads:
        tq, iq = intersect_quads(scene, o, d, t_min, t_max)
    else:
        tq = jnp.full_like(ts, INF)
        iq = jnp.zeros_like(is_)
    return merge_solid_medium(scene, o, d, t_min, t_max, u_med, ts, is_,
                              tq, iq)


def make_hit(scene: SceneArrays, o, d, time, t, fam, idx) -> Hit:
    """Reconstruct the full hit record for each ray's winning primitive."""
    n = t.shape[0]
    # Misses carry t == INF; clamp so downstream texture/normal math on the
    # (masked-out) miss lanes stays finite — 0 * NaN would poison the batch.
    t_eff = jnp.where(fam != FAM_NONE, t, jnp.float32(0.0))
    p = o + t_eff[:, None] * d

    is_sphere = fam == FAM_SPHERE
    is_quad = fam == FAM_QUAD
    is_medium = fam == FAM_MEDIUM

    # --- sphere details (gathered for the winner only) -------------------
    si = jnp.where(is_sphere, idx, 0)
    c0 = scene.sphere_c0[si]
    dc = scene.sphere_dc[si]
    f = ((time - scene.sphere_t0[si]) * scene.sphere_inv_dt[si])[:, None]
    center = c0 + f * dc
    radius = scene.sphere_radius[si]
    outward_s = (p - center) / radius[:, None]  # sign(r) flip is implicit
    # Sphere uv from the unit outward direction with |r| (RTTNW ch. 4.2).
    unit_out = (p - center) / jnp.abs(radius)[:, None]
    theta = jnp.arccos(jnp.clip(-unit_out[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(-unit_out[:, 2], unit_out[:, 0]) + jnp.pi
    uv_sphere = jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], axis=-1)
    mat_sphere = scene.sphere_mat[si]

    # --- quad details ----------------------------------------------------
    if scene.has_quads:
        qi = jnp.where(is_quad, idx, 0)
        qu = scene.quad_u[qi]
        qv = scene.quad_v[qi]
        qq = scene.quad_q[qi]
        qn = jnp.cross(qu, qv)
        nn = jnp.sum(qn * qn, axis=-1, keepdims=True)
        inv_nn = 1.0 / jnp.maximum(nn, 1e-20)
        outward_q = qn * jax.lax.rsqrt(jnp.maximum(nn, 1e-20))
        pq = p - qq
        alpha = jnp.sum(pq * (jnp.cross(qv, qn) * inv_nn), axis=-1)
        beta = jnp.sum(pq * (jnp.cross(qn, qu) * inv_nn), axis=-1)
        uv_quad = jnp.stack([alpha, beta], axis=-1)
        mat_quad = scene.quad_mat[qi]
    else:
        outward_q = jnp.zeros((n, 3), jnp.float32)
        uv_quad = jnp.zeros((n, 2), jnp.float32)
        mat_quad = jnp.zeros((n,), jnp.int32)

    # --- medium details --------------------------------------------------
    if scene.has_media:
        mi = jnp.where(is_medium, idx, 0)
        mat_medium = scene.med_mat[mi]
    else:
        mat_medium = jnp.zeros((n,), jnp.int32)

    outward = jnp.where(is_sphere[:, None], outward_s,
                        jnp.where(is_quad[:, None], outward_q,
                                  jnp.broadcast_to(
                                      jnp.array([1.0, 0.0, 0.0],
                                                jnp.float32), (n, 3))))
    # Medium "hits" are volumetric: front_face is defined true and the
    # normal is arbitrary (RTTNW ch. 9).
    front_face = jnp.where(is_medium,
                           True, jnp.sum(d * outward, axis=-1) < 0.0)
    normal = jnp.where(front_face[:, None], outward, -outward)

    mat_id = jnp.where(is_sphere, mat_sphere,
                       jnp.where(is_quad, mat_quad, mat_medium)).astype(
                           jnp.int32)
    uv = jnp.where(is_sphere[:, None], uv_sphere,
                   jnp.where(is_quad[:, None], uv_quad,
                             jnp.zeros((n, 2), jnp.float32)))
    return Hit(t=t, p=p, normal=normal, front_face=front_face,
               mat_id=mat_id, uv=uv, hit_mask=fam != FAM_NONE)
