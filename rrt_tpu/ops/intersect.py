"""Fused Pallas intersection kernels.

The XLA matmul-form intersection (rrt_tpu.geometry) materializes several
(N, S) intermediates in HBM per bounce — the dominant memory traffic of
the renderer. These kernels fuse quadratic solve + root selection + argmin
into one VMEM-resident pass: HBM traffic drops to O(N + S) per bounce
(read rays, write winners), leaving the VPU as the bottleneck — the
Pallas analog of the reference's hand-SIMD hot loop (src/sphere.rs:68-101,
src/acceleration.rs:60-84).

Layout: rays ride the *lane* dimension (last, 128-aligned), primitives the
sublane dimension, so each candidate tile is (TS, TN) and the winner
reduction is a native cross-sublane min/argmin. The primitive grid axis is
innermost and revisits the same output block, accumulating a running
(best_t, best_idx).

Sphere motion is pre-folded on the pack side:
    c(t) = c0 + (t - t0) * inv_dt * dc  ==  base + t * vel
with base = c0 - t0*inv_dt*dc and vel = inv_dt*dc, so the kernel pays one
madd per component only when the scene actually has moving spheres.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38  # python float: jnp constants may not be captured by kernels

TN = 512  # rays per tile (lanes)
TS = 256  # primitives per tile (sublanes)


def _round_up(x, m):
    return -(-x // m) * m


def _pad_cols(mat, multiple):
    """Zero-pad the last axis to a multiple (zero columns are inert: the
    valid row is 0 for primitives; padded ray lanes are sliced off)."""
    n = mat.shape[-1]
    target = max(multiple, _round_up(n, multiple))
    if target == n:
        return mat
    return jnp.pad(mat, ((0, 0), (0, target - n)))


# ---------------------------------------------------------------------------
# Packing (host/trace side; cheap O(N + S) reshapes)
# ---------------------------------------------------------------------------


def pack_rays(o, d, time, t_min):
    """(8, N) ray component matrix: ox oy oz dx dy dz time t_min.

    o, d are component-SoA V3 — the stack is a cheap row concat with no
    transposes (the (N,3) layout would need a lane-shuffling transpose)."""
    return jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, time, t_min], axis=0)


def pack_spheres(scene):
    """(8, S) sphere matrix: bx by bz r2 vx vy vz valid."""
    base = scene.sphere_c0 - (scene.sphere_t0
                              * scene.sphere_inv_dt)[:, None] \
        * scene.sphere_dc
    vel = scene.sphere_inv_dt[:, None] * scene.sphere_dc
    r2 = scene.sphere_radius ** 2
    return jnp.concatenate(
        [base.T, r2[None, :], vel.T,
         scene.sphere_valid.astype(jnp.float32)[None, :]], axis=0)


def pack_quads(scene):
    """(16, Q) quad matrix: n(3) g(3) h(3) d_plane q_g q_h eps_n valid
    pad(2).

    g, h are the planar frame vectors with alpha = (p-Q).g, beta = (p-Q).h
    (see geometry._quad_frames); eps_n = 1e-8 * |n| is the parallel-ray
    threshold scale."""
    u, v, q = scene.quad_u, scene.quad_v, scene.quad_q
    n = jnp.cross(u, v)
    nn = jnp.sum(n * n, axis=-1, keepdims=True)
    inv_nn = 1.0 / jnp.maximum(nn, 1e-20)
    g = jnp.cross(v, n) * inv_nn
    h = jnp.cross(n, u) * inv_nn
    d_plane = jnp.sum(n * q, axis=-1)
    q_g = jnp.sum(g * q, axis=-1)
    q_h = jnp.sum(h * q, axis=-1)
    eps_n = 1e-8 * jnp.sqrt(jnp.maximum(nn[:, 0], 1e-20))
    nq = q.shape[0]
    zeros = jnp.zeros((2, nq), jnp.float32)
    return jnp.concatenate(
        [n.T, g.T, h.T, d_plane[None, :], q_g[None, :], q_h[None, :],
         eps_n[None, :], scene.quad_valid.astype(jnp.float32)[None, :],
         zeros], axis=0)


# ---------------------------------------------------------------------------
# Sphere kernel
# ---------------------------------------------------------------------------


def _sphere_kernel(ray_ref, t_max_ref, sph_ref, t_out_ref, idx_out_ref, *,
                   moving: bool):
    s = pl.program_id(1)

    ox = ray_ref[0:1, :]
    oy = ray_ref[1:2, :]
    oz = ray_ref[2:3, :]
    dx = ray_ref[3:4, :]
    dy = ray_ref[4:5, :]
    dz = ray_ref[5:6, :]
    t_min = ray_ref[7:8, :]
    t_max = t_max_ref[0:1, :]

    bx = sph_ref[0:1, :].T  # (TS,1)
    by = sph_ref[1:2, :].T
    bz = sph_ref[2:3, :].T
    r2 = sph_ref[3:4, :].T
    valid = sph_ref[7:8, :].T > 0.5

    if moving:
        time = ray_ref[6:7, :]
        cxt = bx + time * sph_ref[4:5, :].T
        cyt = by + time * sph_ref[5:6, :].T
        czt = bz + time * sph_ref[6:7, :].T
    else:
        cxt, cyt, czt = bx, by, bz

    a = dx * dx + dy * dy + dz * dz  # (1,TN)
    o_dot_d = ox * dx + oy * dy + oz * dz
    o_dot_o = ox * ox + oy * oy + oz * oz
    inv_a = 1.0 / a

    d_c = dx * cxt + dy * cyt + dz * czt  # (TS,TN)
    o_c = ox * cxt + oy * cyt + oz * czt
    c_sq = cxt * cxt + cyt * cyt + czt * czt

    half_b = o_dot_d - d_c
    c_coef = o_dot_o - 2.0 * o_c + c_sq - r2
    disc = half_b * half_b - a * c_coef
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    root0 = (-half_b - sq) * inv_a
    root1 = (-half_b + sq) * inv_a

    ok = (disc > 0.0) & valid
    in0 = ok & (root0 > t_min) & (root0 < t_max)
    in1 = ok & (root1 > t_min) & (root1 < t_max)
    t_cand = jnp.where(in0, root0, jnp.where(in1, root1, INF))

    t_tile = jnp.min(t_cand, axis=0, keepdims=True)  # (1,TN)
    local_idx = jnp.argmin(t_cand, axis=0).astype(jnp.int32)[None, :]
    idx_tile = local_idx + s * TS

    @pl.when(s == 0)
    def _():
        t_out_ref[:, :] = t_tile
        idx_out_ref[:, :] = idx_tile

    @pl.when(s > 0)
    def _():
        prev_t = t_out_ref[:, :]
        prev_i = idx_out_ref[:, :]
        better = t_tile < prev_t
        t_out_ref[:, :] = jnp.where(better, t_tile, prev_t)
        idx_out_ref[:, :] = jnp.where(better, idx_tile, prev_i)


@functools.partial(jax.jit, static_argnames=("moving",))
def sphere_intersect(rays8, t_max, spheres8, *, moving: bool):
    """rays8 (8, N) from pack_rays; spheres8 (8, S) from pack_spheres.
    Returns (t (N,), idx (N,) i32); misses have t == INF.
    Inputs are zero-padded to tile multiples internally."""
    n = rays8.shape[1]
    rays8 = _pad_cols(rays8, TN)
    t_max = _pad_cols(t_max[None, :], TN)
    spheres8 = _pad_cols(spheres8, TS)
    n_pad = rays8.shape[1]
    s_count = spheres8.shape[1]
    grid = (n_pad // TN, s_count // TS)

    t, idx = pl.pallas_call(
        functools.partial(_sphere_kernel, moving=moving),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TS), lambda i, s: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=35 * n_pad * s_count,
            bytes_accessed=4 * (11 * n_pad + 8 * s_count),
            transcendentals=n_pad * s_count),
    )(rays8, t_max, spheres8)
    return t[0, :n], idx[0, :n]


# ---------------------------------------------------------------------------
# Quad kernel
# ---------------------------------------------------------------------------


def _quad_kernel(ray_ref, t_max_ref, quad_ref, t_out_ref, idx_out_ref):
    s = pl.program_id(1)

    ox = ray_ref[0:1, :]
    oy = ray_ref[1:2, :]
    oz = ray_ref[2:3, :]
    dx = ray_ref[3:4, :]
    dy = ray_ref[4:5, :]
    dz = ray_ref[5:6, :]
    t_min = ray_ref[7:8, :]
    t_max = t_max_ref[0:1, :]

    nx = quad_ref[0:1, :].T  # (TS,1)
    ny = quad_ref[1:2, :].T
    nz = quad_ref[2:3, :].T
    gx = quad_ref[3:4, :].T
    gy = quad_ref[4:5, :].T
    gz = quad_ref[5:6, :].T
    hx = quad_ref[6:7, :].T
    hy = quad_ref[7:8, :].T
    hz = quad_ref[8:9, :].T
    d_plane = quad_ref[9:10, :].T
    q_g = quad_ref[10:11, :].T
    q_h = quad_ref[11:12, :].T
    eps_n = quad_ref[12:13, :].T
    valid = quad_ref[13:14, :].T > 0.5

    d_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # (1,TN)

    denom = dx * nx + dy * ny + dz * nz  # (TS,TN)
    o_n = ox * nx + oy * ny + oz * nz
    not_parallel = jnp.abs(denom) > eps_n * d_len
    safe = jnp.where(not_parallel, denom, 1.0)
    t = (d_plane - o_n) / safe

    o_g = ox * gx + oy * gy + oz * gz
    d_g = dx * gx + dy * gy + dz * gz
    o_h = ox * hx + oy * hy + oz * hz
    d_h = dx * hx + dy * hy + dz * hz
    alpha = o_g + t * d_g - q_g
    beta = o_h + t * d_h - q_h

    ok = (valid & not_parallel & (t > t_min) & (t < t_max)
          & (alpha >= 0.0) & (alpha <= 1.0)
          & (beta >= 0.0) & (beta <= 1.0))
    t_cand = jnp.where(ok, t, INF)

    t_tile = jnp.min(t_cand, axis=0, keepdims=True)
    local_idx = jnp.argmin(t_cand, axis=0).astype(jnp.int32)[None, :]
    idx_tile = local_idx + s * TS

    @pl.when(s == 0)
    def _():
        t_out_ref[:, :] = t_tile
        idx_out_ref[:, :] = idx_tile

    @pl.when(s > 0)
    def _():
        prev_t = t_out_ref[:, :]
        prev_i = idx_out_ref[:, :]
        better = t_tile < prev_t
        t_out_ref[:, :] = jnp.where(better, t_tile, prev_t)
        idx_out_ref[:, :] = jnp.where(better, idx_tile, prev_i)


@jax.jit
def quad_intersect(rays8, t_max, quads16):
    """rays8 (8, N); quads16 (16, Q) from pack_quads.
    Returns (t (N,), idx (N,) i32)."""
    n = rays8.shape[1]
    rays8 = _pad_cols(rays8, TN)
    t_max = _pad_cols(t_max[None, :], TN)
    quads16 = _pad_cols(quads16, TS)
    n_pad = rays8.shape[1]
    q_count = quads16.shape[1]
    grid = (n_pad // TN, q_count // TS)

    t, idx = pl.pallas_call(
        _quad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TS), lambda i, s: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * n_pad * q_count,
            bytes_accessed=4 * (11 * n_pad + 16 * q_count),
            transcendentals=n_pad),
    )(rays8, t_max, quads16)
    return t[0, :n], idx[0, :n]
