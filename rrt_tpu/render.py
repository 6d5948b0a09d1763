"""Wavefront render core: the centerpiece rewrite.

The reference's hot path is a per-pixel recursive `trace` to depth 50 with a
BVH walk inside (reference: src/lib.rs:50-71, 96-103). On TPU the recursion
inverts into an *iterative bounce loop over a megabatch of rays*:

  generate (pixels x samples_per_pass) rays as one SoA batch
  loop bounce = 0..max_depth:
      intersect batch against every primitive family (matmul form, MXU)
      miss -> accumulate background, die
      hit  -> accumulate emission; scatter; update throughput + alive mask
  (early exit when no ray is alive)

Two loop drivers share one body:
  * `lax.while_loop` for forward rendering — exits as soon as the batch is
    dead (most paths die in a handful of bounces, so this is the fast path);
  * `lax.scan` with `jax.checkpoint` for the differentiable path —
    reverse-differentiable, with per-bounce rematerialization so the big
    (N,S) intersection intermediates are never stored (the O(1)-in-depth
    memory story of path-replay backprop, SURVEY.md §5.7).

Discrete decisions (argmin winner, front-face flip, dielectric branch,
metal absorption) are integer/boolean selects: gradients flow only through
the continuous quantities, i.e. detached sampling by construction.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import rng
from .camera import Camera, generate_rays
from .geometry import INF, intersect_all, make_hit
from .materials import scatter
from .scene import BG_SKY, SceneArrays


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 400
    height: int = 225
    spp: int = 32
    max_depth: int = 50
    # Rays per traced batch = tile_pixels * samples_per_pass. Bounds the
    # (N, S) intersection working set in HBM.
    tile_pixels: int = 16384
    samples_per_pass: int = 4
    t_min: float = 1.0e-3


def background_color(scene: SceneArrays, d):
    """Miss shader: the RTIOW vertical sky lerp (reference src/lib.rs:66-70)
    or a solid color for emissive scenes."""
    n2 = jnp.sum(d * d, axis=-1, keepdims=True)
    unit_y = d[:, 1:2] * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))
    t = 0.5 * (unit_y + 1.0)
    sky = (1.0 - t) * scene.bg_bottom[None, :] + t * scene.bg_top[None, :]
    return jnp.where(scene.bg_mode == BG_SKY, sky, scene.bg_bottom[None, :])


def _bounce_body(scene, t_min, bkey, carry, bounce, max_depth):
    o, d, time, throughput, radiance, alive, n_traced = carry
    n = o.shape[0]

    if scene.has_media:
        km = rng.draw_key(bkey, bounce, rng.STREAM_MEDIUM)
        u_med = rng.uniform(km, (n, scene.n_media))
    else:
        u_med = None

    t_min_v = jnp.full((n,), t_min, jnp.float32)
    t_max_v = jnp.full((n,), INF, jnp.float32)
    t, fam, idx, hit_mask = intersect_all(scene, o, d, time, t_min_v,
                                          t_max_v, u_med)
    hit_mask = hit_mask & alive
    miss_mask = alive & ~hit_mask

    hit = make_hit(scene, o, d, time, t, fam, idx)
    sc = scatter(scene, d, hit, bkey, bounce)

    bg = background_color(scene, d)
    radiance = radiance + throughput * bg * miss_mask[:, None]
    if scene.has_emissive:
        radiance = radiance + throughput * sc.emitted * hit_mask[:, None]

    # The reference kills rays that hit at depth >= 50 *before* scattering
    # (src/lib.rs:58-60); misses at that depth still see the sky, which is
    # why the loop runs max_depth+1 times with scattering suppressed on the
    # final pass.
    can_scatter = bounce < max_depth
    new_alive = hit_mask & sc.scattered & can_scatter
    throughput = jnp.where(new_alive[:, None],
                           throughput * sc.attenuation, throughput)
    o = jnp.where(new_alive[:, None], hit.p, o)
    d = jnp.where(new_alive[:, None], sc.direction, d)

    n_traced = n_traced + jnp.sum(alive.astype(jnp.int32))
    return (o, d, time, throughput, radiance, new_alive, n_traced)


def trace_batch(scene: SceneArrays, o, d, time, bkey, max_depth: int,
                t_min: float, differentiable: bool):
    """Trace a ray batch to completion.

    Returns (radiance (N,3), n_traced () int32 — total intersect-tested
    rays, the Mrays/s numerator).
    """
    n = o.shape[0]
    carry0 = (o, d, time,
              jnp.ones((n, 3), jnp.float32),  # throughput
              jnp.zeros((n, 3), jnp.float32),  # radiance
              jnp.ones((n,), bool),  # alive
              jnp.zeros((), jnp.int32))

    body = partial(_bounce_body, scene, t_min, bkey, max_depth=max_depth)

    if differentiable:
        def scan_step(carry, bounce):
            return jax.checkpoint(
                lambda c, b: body(c, b))(carry, bounce), None
        carry, _ = jax.lax.scan(scan_step, carry0,
                                jnp.arange(max_depth + 1))
    else:
        def cond(state):
            bounce, carry = state
            return (bounce <= max_depth) & jnp.any(carry[5])

        def step(state):
            bounce, carry = state
            return bounce + 1, body(carry, bounce)

        _, carry = jax.lax.while_loop(cond, step, (jnp.zeros((), jnp.int32),
                                                   carry0))
    radiance = carry[4]
    n_traced = carry[6]
    return radiance, n_traced


def render_tile(scene: SceneArrays, camera: Camera, px, py, cfg: RenderConfig,
                seed_key, tile_id, pass_start, n_passes: int,
                differentiable: bool = False):
    """Render one tile of pixels with `n_passes` sample passes.

    px, py: (P,) pixel coordinates. Each pass traces P*samples_per_pass
    jittered rays. Returns (radiance_sum (P,3) — *sum* over samples, divide
    by spp at assembly — and n_traced).
    """
    p_count = px.shape[0]
    spc = cfg.samples_per_pass
    pxr = jnp.tile(px, spc)
    pyr = jnp.tile(py, spc)

    def one_pass(pass_i):
        bkey = rng.batch_key(seed_key, tile_id, pass_start + pass_i)
        o, d, tm = generate_rays(camera, pxr, pyr, cfg.width, cfg.height,
                                 bkey)
        radiance, n_traced = trace_batch(scene, o, d, tm, bkey,
                                         cfg.max_depth, cfg.t_min,
                                         differentiable)
        # (P*spc,3) -> (P,3) partial sample sum.
        return jnp.sum(radiance.reshape(spc, p_count, 3), axis=0), n_traced

    def body(pass_i, acc):
        acc_rad, acc_n = acc
        r, nt = one_pass(pass_i)
        return acc_rad + r, acc_n + nt

    if differentiable:
        # Unrolled python loop keeps the pass loop reverse-differentiable
        # without a scan-of-remat (n_passes is small in training use).
        acc = (jnp.zeros((p_count, 3), jnp.float32),
               jnp.zeros((), jnp.int32))
        for i in range(n_passes):
            acc = body(jnp.int32(i), acc)
        return acc
    return jax.lax.fori_loop(
        0, n_passes, body, (jnp.zeros((p_count, 3), jnp.float32),
                            jnp.zeros((), jnp.int32)))


def _tile_coords(cfg: RenderConfig):
    """Flat pixel ids split into fixed-size tiles (padded with repeats of
    the last pixel; duplicates are masked out at assembly)."""
    n_pix = cfg.width * cfg.height
    tp = min(cfg.tile_pixels, n_pix)
    n_tiles = -(-n_pix // tp)
    ids = jnp.arange(n_tiles * tp, dtype=jnp.int32)
    ids = jnp.minimum(ids, n_pix - 1)
    px = ids % cfg.width
    py = ids // cfg.width
    return px.reshape(n_tiles, tp), py.reshape(n_tiles, tp), n_tiles, tp


@partial(jax.jit, static_argnames=("cfg", "differentiable"))
def render_image(scene: SceneArrays, camera: Camera, cfg: RenderConfig,
                 seed: jax.Array, differentiable: bool = False):
    """Render the full image on the local device.

    Returns (image (H,W,3) float radiance in [0,inf), n_traced).
    Multi-device rendering lives in parallel.mesh.
    """
    if cfg.spp % cfg.samples_per_pass != 0:
        raise ValueError("spp must be a multiple of samples_per_pass")
    seed_key = jax.random.key(seed) if jnp.issubdtype(
        jnp.asarray(seed).dtype, jnp.integer) else seed
    px, py, n_tiles, tp = _tile_coords(cfg)
    n_passes = cfg.spp // cfg.samples_per_pass

    def do_tile(tile_id):
        return render_tile(scene, camera, px[tile_id], py[tile_id], cfg,
                           seed_key, tile_id, 0, n_passes,
                           differentiable=differentiable)

    rad, n_traced = jax.lax.map(do_tile, jnp.arange(n_tiles,
                                                    dtype=jnp.int32))
    rad = rad.reshape(n_tiles * tp, 3)[: cfg.width * cfg.height]
    image = rad.reshape(cfg.height, cfg.width, 3) / jnp.float32(cfg.spp)
    return image, jnp.sum(n_traced)


def tonemap(image):
    """Gamma-2.0 to RGB8, saturating like the reference's `as u8`
    (src/lib.rs:104-108)."""
    c = jnp.sqrt(jnp.maximum(image, 0.0)) * 255.99
    return jnp.clip(c, 0.0, 255.0).astype(jnp.uint8)
