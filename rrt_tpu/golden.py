"""Golden-reference renderer: slow, scalar, obviously-correct NumPy.

This is the test oracle demanded by the survey (§4 item 2) — a direct
recursive implementation of the books' math in the style of the reference's
`trace` + linear `closest_hit` scan (reference: src/lib.rs:32-47,50-71),
kept alive as a correctness oracle the way the reference keeps its dead
linear-scan fallback.

Determinism contract: the golden consumes the *exact same* counter-based
random draw tensors as the wavefront loop (precomputed per (bounce, stream)
via `extract_draws`), so for identical rays the radiance must match the
device renderer to float32 tolerance per ray — a far tighter oracle than
distribution-level comparison.
"""

import numpy as np

import jax

from . import rng
from .scene import (BG_SKY, BOUND_SPHERE, MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT,
                    MAT_ISOTROPIC, MAT_LAMBERTIAN, MAT_METAL, TEX_CHECKER,
                    TEX_IMAGE, TEX_PERLIN, TEX_SOLID)

INF = np.float32(3.0e38)


class GoldenScene:
    """NumPy view of SceneArrays.

    Box-family primitives are expanded into the books' 6-quad
    decomposition (scene.boxes_as_quads): the golden stays a direct
    transcription of the books, and the device's one-slab-test box is
    validated against it."""

    def __init__(self, scene):
        for f in scene.__dataclass_fields__:
            v = getattr(scene, f)
            setattr(self, f, np.asarray(v) if hasattr(v, "shape") else v)
        if getattr(scene, "has_boxes", False):
            from .scene import boxes_as_quads
            q, u, v, m = boxes_as_quads(self.box_center, self.box_half,
                                        self.box_cos, self.box_sin,
                                        self.box_mat, self.box_valid)
            self.quad_q = np.concatenate([self.quad_q, q])
            self.quad_u = np.concatenate([self.quad_u, u])
            self.quad_v = np.concatenate([self.quad_v, v])
            self.quad_mat = np.concatenate([self.quad_mat, m])
            self.quad_valid = np.concatenate(
                [self.quad_valid, np.ones(len(m), bool)])


def extract_draws(keys, n_media, max_depth):
    """Precompute every random draw the wavefront loop will make for these
    per-lane sample keys, keyed by (bounce, stream). Per-lane keying means
    the draws depend only on each ray's (seed, pixel, sample) identity, so
    the golden consumes exactly what any driver (batch or queue) consumes."""
    draws = {}
    stack = lambda v: np.stack([np.asarray(v.x), np.asarray(v.y),
                                np.asarray(v.z)], axis=-1)
    for bounce in range(max_depth + 1):
        unit, sphere, choice = rng.scatter_draws(keys, bounce)
        draws[(bounce, "unit")] = stack(unit)
        draws[(bounce, "sphere")] = stack(sphere)
        draws[(bounce, "choice")] = np.asarray(choice)
        draws[(bounce, "medium")] = np.asarray(
            rng.medium_draws(keys, bounce, max(n_media, 1))).T  # (N,D)
    return draws


# --- intersection (scalar) ----------------------------------------------


def _hit_spheres(s: GoldenScene, o, d, time, t_min, t_max):
    best_t, best_i = INF, -1
    for i in range(len(s.sphere_radius)):
        if not s.sphere_valid[i]:
            continue
        f = (time - s.sphere_t0[i]) * s.sphere_inv_dt[i]
        center = s.sphere_c0[i] + f * s.sphere_dc[i]
        oc = o - center
        a = float(d @ d)
        half_b = float(oc @ d)
        c = float(oc @ oc) - float(s.sphere_radius[i]) ** 2
        disc = half_b * half_b - a * c
        if disc <= 0.0:
            continue
        sq = np.sqrt(disc)
        for root in ((-half_b - sq) / a, (-half_b + sq) / a):
            if t_min < root < t_max and root < best_t:
                best_t, best_i = root, i
                break
    return best_t, best_i


def _hit_quads(s: GoldenScene, o, d, t_min, t_max):
    best_t, best_i = INF, -1
    for i in range(len(s.quad_mat)):
        if not s.quad_valid[i]:
            continue
        q, u, v = s.quad_q[i], s.quad_u[i], s.quad_v[i]
        n = np.cross(u, v)
        denom = float(n @ d)
        if abs(denom) <= 1e-8 * np.linalg.norm(n) * np.linalg.norm(d):
            continue
        t = (float(n @ q) - float(n @ o)) / denom
        if not (t_min < t < t_max) or t >= best_t:
            continue
        p = o + t * d
        w = n / float(n @ n)
        alpha = float(w @ np.cross(p - q, v))
        beta = float(w @ np.cross(u, p - q))
        if 0.0 <= alpha <= 1.0 and 0.0 <= beta <= 1.0:
            best_t, best_i = t, i
    return best_t, best_i


def _medium_interval(s: GoldenScene, i, o, d):
    if s.med_btype[i] == BOUND_SPHERE:
        oc = o - s.med_center[i]
        a = float(d @ d)
        half_b = float(oc @ d)
        c = float(oc @ oc) - float(s.med_radius[i]) ** 2
        disc = half_b * half_b - a * c
        if disc <= 0.0:
            return None
        sq = np.sqrt(disc)
        return (-half_b - sq) / a, (-half_b + sq) / a
    rot = s.med_rot[i]
    ob = rot.T @ (o - s.med_center[i])
    db = rot.T @ d
    lo, hi = -np.inf, np.inf
    for k in range(3):
        h = s.med_half[i][k]
        if abs(db[k]) <= 1e-12:
            if abs(ob[k]) > h:
                return None
            continue
        t1, t2 = (-h - ob[k]) / db[k], (h - ob[k]) / db[k]
        lo, hi = max(lo, min(t1, t2)), min(hi, max(t1, t2))
    if lo >= hi:
        return None
    return lo, hi


def _hit_media(s: GoldenScene, o, d, t_min, t_max, u_med):
    best_t, best_i = INF, -1
    for i in range(len(s.med_mat)):
        if not s.med_valid[i]:
            continue
        interval = _medium_interval(s, i, o, d)
        if interval is None:
            continue
        te, tx = max(interval[0], t_min), min(interval[1], t_max)
        if te >= tx:
            continue
        te = max(te, 0.0)
        if te >= tx:
            continue
        dlen = np.linalg.norm(d)
        dist_inside = (tx - te) * dlen
        hit_dist = float(s.med_neg_inv_density[i]) * np.log(
            max(float(u_med[i]), 1e-12))
        if hit_dist > dist_inside:
            continue
        t = te + hit_dist / dlen
        if t < best_t:
            best_t, best_i = t, i
    return best_t, best_i


# --- textures / materials (scalar) --------------------------------------


def _lattice_grad(ix, iy, iz):
    """Hashed lattice gradient — must match textures._lattice_grad."""
    h = np.uint32(
        (np.uint32(ix & 0xFFFFFFFF) * np.uint32(0x8DA6B343)
         + np.uint32(iy & 0xFFFFFFFF) * np.uint32(0xD8163841)
         + np.uint32(iz & 0xFFFFFFFF) * np.uint32(0xCB1AB31F))
        & 0xFFFFFFFF)
    h = np.uint32(h ^ (h >> np.uint32(13)))
    h = np.uint32((h * np.uint32(0x85EBCA6B)) & 0xFFFFFFFF)
    h = np.uint32(h ^ (h >> np.uint32(16)))
    scale = np.float32(2.0 / 1024.0)
    g = np.array([
        np.float32(int(h & np.uint32(1023))) * scale - 1.0,
        np.float32(int((h >> np.uint32(10)) & np.uint32(1023))) * scale
        - 1.0,
        np.float32(int((h >> np.uint32(20)) & np.uint32(1023))) * scale
        - 1.0])
    return g / np.sqrt(max(float(g @ g), 1e-6))


def _perlin_noise(s: GoldenScene, p):
    pf = np.floor(p)
    u = p - pf
    uu = u * u * (3.0 - 2.0 * u)
    i, j, k = (int(pf[0]), int(pf[1]), int(pf[2]))
    acc = 0.0
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                grad = _lattice_grad(i + di, j + dj, k + dk)
                weight = np.array([u[0] - di, u[1] - dj, u[2] - dk])
                w = ((uu[0] if di else 1 - uu[0])
                     * (uu[1] if dj else 1 - uu[1])
                     * (uu[2] if dk else 1 - uu[2]))
                acc += w * float(grad @ weight)
    return acc


def _perlin_turb(s, p, depth=7):
    acc, temp, weight = 0.0, p.copy(), 1.0
    for _ in range(depth):
        acc += weight * abs(_perlin_noise(s, temp))
        temp = temp * 2.0
        weight *= 0.5
    return acc


def _texture(s: GoldenScene, tex_id, u, v, p):
    tt = s.tex_type[tex_id]
    c1, c2 = s.tex_color1[tex_id], s.tex_color2[tex_id]
    scale = float(s.tex_scale[tex_id])
    if tt == TEX_SOLID:
        return c1
    if tt == TEX_CHECKER:
        sines = (np.sin(scale * p[0]) * np.sin(scale * p[1])
                 * np.sin(scale * p[2]))
        return c2 if sines < 0.0 else c1
    if tt == TEX_PERLIN:
        return 0.5 * (1.0 + np.sin(scale * p[2]
                                   + 10.0 * _perlin_turb(s, p))) * c1
    if tt == TEX_IMAGE:
        img = s.images[s.tex_image[tex_id]]
        ah, aw = img.shape[:2]
        xi = min(int(np.clip(u, 0, 1) * aw), aw - 1)
        yi = min(int((1.0 - np.clip(v, 0, 1)) * ah), ah - 1)
        return img[yi, xi]
    raise ValueError(tt)


def _reflect(v, n):
    return v - 2.0 * float(v @ n) * n


def _refract(unit_d, n, ratio):
    cos_theta = min(float(-unit_d @ n), 1.0)
    r_perp = ratio * (unit_d + cos_theta * n)
    r_par = -np.sqrt(max(1.0 - float(r_perp @ r_perp), 0.0)) * n
    return r_perp + r_par


def _schlick(cosine, ref_idx):
    r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


# --- the recursive trace -------------------------------------------------


def trace_ray(s: GoldenScene, o, d, time, ray_idx, draws, max_depth,
              t_min=1.0e-3):
    """Iterative version of the reference's recursive `trace`, consuming the
    shared draw tensors. Returns radiance (3,)."""
    throughput = np.ones(3, np.float64)
    radiance = np.zeros(3, np.float64)
    o, d = np.asarray(o, np.float64), np.asarray(d, np.float64)

    for bounce in range(max_depth + 1):
        ts, si = _hit_spheres(s, o, d, time, t_min, INF)
        tq, qi = _hit_quads(s, o, d, t_min, INF)
        t_solid, solid_fam, solid_i = (ts, 0, si) if ts <= tq else (tq, 1, qi)
        u_med = draws[(bounce, "medium")][ray_idx]
        tm, mi = _hit_media(s, o, d, t_min, min(INF, t_solid), u_med)
        if tm < t_solid:
            t, fam, idx = tm, 2, mi
        else:
            t, fam, idx = t_solid, solid_fam, solid_i

        if idx < 0 or t >= INF:  # miss -> background
            if s.bg_mode == BG_SKY:
                ud = d / np.linalg.norm(d)
                tt = 0.5 * (ud[1] + 1.0)
                bg = (1.0 - tt) * s.bg_bottom + tt * s.bg_top
            else:
                bg = s.bg_bottom
            radiance += throughput * bg
            break

        p = o + t * d
        if fam == 0:
            f = (time - s.sphere_t0[idx]) * s.sphere_inv_dt[idx]
            center = s.sphere_c0[idx] + f * s.sphere_dc[idx]
            outward = (p - center) / float(s.sphere_radius[idx])
            unit_out = (p - center) / abs(float(s.sphere_radius[idx]))
            theta = np.arccos(np.clip(-unit_out[1], -1, 1))
            phi = np.arctan2(-unit_out[2], unit_out[0]) + np.pi
            uv = (phi / (2 * np.pi), theta / np.pi)
            mat = int(s.sphere_mat[idx])
            front = float(d @ outward) < 0.0
        elif fam == 1:
            qu, qv = s.quad_u[idx], s.quad_v[idx]
            n = np.cross(qu, qv)
            outward = n / np.linalg.norm(n)
            w = n / float(n @ n)
            pq = p - s.quad_q[idx]
            uv = (float(w @ np.cross(pq, qv)), float(w @ np.cross(qu, pq)))
            mat = int(s.quad_mat[idx])
            front = float(d @ outward) < 0.0
        else:
            outward = np.array([1.0, 0.0, 0.0])
            uv = (0.0, 0.0)
            mat = int(s.med_mat[idx])
            front = True
        normal = outward if front else -outward

        mtype = int(s.mat_type[mat])
        albedo = np.asarray(
            _texture(s, int(s.mat_tex[mat]), uv[0], uv[1], p), np.float64)

        if mtype == MAT_DIFFUSE_LIGHT:
            radiance += throughput * albedo
            break
        if bounce >= max_depth:  # hit at max depth scatters to black
            break

        unit_rand = draws[(bounce, "unit")][ray_idx].astype(np.float64)
        sphere_rand = draws[(bounce, "sphere")][ray_idx].astype(np.float64)
        u_choice = float(draws[(bounce, "choice")][ray_idx])

        if mtype == MAT_LAMBERTIAN:
            new_d = normal + unit_rand
            if np.all(np.abs(new_d) < 1e-8):
                new_d = normal
            atten = albedo
        elif mtype == MAT_METAL:
            unit_d = d / np.linalg.norm(d)
            new_d = _reflect(unit_d, normal) \
                + float(s.mat_fuzz[mat]) * sphere_rand
            if float(new_d @ normal) <= 0.0:
                break  # absorbed
            atten = albedo
        elif mtype == MAT_DIELECTRIC:
            ior = float(s.mat_ior[mat])
            ratio = (1.0 / ior) if front else ior
            unit_d = d / np.linalg.norm(d)
            cos_theta = min(float(-unit_d @ normal), 1.0)
            sin_theta = np.sqrt(max(1.0 - cos_theta * cos_theta, 0.0))
            if ratio * sin_theta > 1.0 or _schlick(cos_theta,
                                                   ratio) > u_choice:
                new_d = _reflect(unit_d, normal)
            else:
                new_d = _refract(unit_d, normal, ratio)
            atten = np.ones(3)
        elif mtype == MAT_ISOTROPIC:
            new_d = sphere_rand
            atten = albedo
        else:
            raise ValueError(mtype)

        throughput = throughput * atten
        o, d = p, new_d
    return radiance
