"""Tile-resident fused training step: differentiable `render_tiles`.

Round 2's chain-based custom_vjp (ops.megakernel_vjp) made the backward
pass a Pallas kernel, but the *driver* around it stayed XLA: camera ray
generation, state packing, two stream compactions and their transposes,
and the pack/unpack glue add ~25 ms of fusions plus ~50 ms of dispatch
gaps per grad step on this runtime — 5-6x the kernel time. This module
removes the driver entirely by making the tile-resident renderer
(ops.megakernel.render_tiles — one launch for all pixels x samples,
in-kernel camera + regeneration) reverse-differentiable:

  * forward  = `render_tiles_spill`: the tile free-run kernel, plus a
    side output that spills the full loop carry every K-th step (the
    "segment boundaries" of classic sqrt-checkpointing) and the
    executed step count. Costs a few % over the plain forward.
  * backward = `_train_bwd_kernel`: ONE launch. Per ray tile, walk the
    segments in reverse: reload the boundary carry, replay its K steps
    into VMEM scratch (every draw is counter-addressed, so replay is
    exact), then sweep those steps backward — re-derive each step from
    the winner's packed attributes as a compact differentiable function
    (megakernel_vjp._make_diff_step) *extended with the flush/regenerate
    tail*, and transpose it with `jax.vjp` inside the kernel body. The
    loss cotangent enters as a per-pixel radiance gradient operand
    (seeding d_pend at each sample-finish flush), and camera gradients
    are accumulated in-kernel through the regeneration rays' thin-lens
    math — no XLA transpose of the ray generator is ever built.

Memory: O(sqrt(n_steps)) — boundary buffer (ceil(max_steps/K) x 24 rows
per lane, written by the forward) + one K x 24-row VMEM scratch. Total
backward compute is replay (1x) + re-derive (1x) + adjoint, i.e. ~2-3x
the forward kernel, with zero glue between.

Gradient scope (`supports_train`): everything the forward megakernel
shades, INCLUDING constant media up to MAX_TRAIN_MEDIA (8) slots —
each medium adds 11
traced parameter rows to the in-kernel adjoint (this is broader than
megakernel_vjp.supports_backward, which excludes media). Discrete
decisions
(argmin winners, roots, branches, texel ids, sample/chain advancement)
are replayed constants, per path-replay backprop (SURVEY.md §5.7).

Replay caveat (shared with megakernel_vjp): the backward replays with a
*separately compiled* kernel; ulp-level fusion differences can flip a
near-tie discrete decision on a sub-percent fraction of lanes, in which
case those lanes contribute the gradient of the (equally valid) replayed
path — bounded noise for SGD, the same divergence class the forward
drivers already document for cross-driver comparisons.

Reference analog: the recursive trace + rayon pixel loop of
/root/reference/src/lib.rs:50-111, which has no backward at all.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import rng
from . import megakernel as mk
from . import megakernel_vjp as mkv
from ..scene import (MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_ISOTROPIC,
                     MAT_LAMBERTIAN, MAT_METAL)

TN = mk.TN
TS = mk.TS
INF = mk.INF

# Carry spill layout, f32 (24, TN): rows 0-15 the packed ray state
# (megakernel.py state layout; alive as f32), 16 sample, 17 chain,
# 18 pxr, 19 pyr, 20 gidf, 21-22 key words (u32 bitcast), 23 pad.
CROWS = 24

# The train kernels' VMEM working set (K-row replay scratch + resident
# segment-boundary block + pack/cotangent accumulators, all TN lanes
# wide) exceeds Mosaic's default 16 MB scoped limit at TN=1024; raise
# it (v5e has 128 MB physical VMEM; the tile kernels are the only
# resident compute anyway).
_VMEM_LIMIT = 64 * 1024 * 1024


def _seg_k(max_steps: int, spp: int = 0) -> int:
    """Segment length: balance the K-row VMEM scratch against the
    ceil(max_steps/K)-row boundary buffer (sqrt-checkpointing). The
    (K*CROWS, TN) replay scratch plus the resident boundary block push
    the backward past Mosaic's default 16 MB scoped-VMEM limit at
    TN=1024, so both train kernels raise it via CompilerParams
    (_VMEM_LIMIT; v5e has 128 MB physical VMEM).

    spp (per-launch sample budget; > 128 means the chunked trainer's
    large chunks — derived HERE so the forward and backward, which must
    agree on K, cannot diverge): above 128 the K cap rises 48 -> 96,
    and above 256 to 192 when the spill layout is lean enough
    (srows <= 80; see _seg_cfg). The boundary buffer is the chunk's HBM
    residual (~103 MB per full-image spp at K=48), so doubling K halves
    it: a 256-spp chunk at K=96 (or a 512-spp chunk at K=192) parks the
    same ~13 GB a 128-spp chunk needed at K=48 — fewer chunks means
    fewer spill-forward re-renders in the chunked trainer, and a
    SINGLE-chunk 500-spp step has none at all. The K sweep measured
    flat timing 48->96 (BASELINE.md); the K-row scratch grows linearly
    (the K=192 backward needs the raised 96 MB scoped limit —
    _seg_cfg)."""
    k = int(np.ceil(np.sqrt(max(max_steps, 1))))
    k = -(-k // 8) * 8
    return max(8, min(96 if spp > 128 else 48, k, max_steps))


# Per-device-call chunk caps the chunked trainer (diff.resolve_spp_chunk)
# derives from: a chunk above HEAVY_CHUNK_CAP spp is only HBM-safe when
# _seg_cfg's K=192 tier halves the boundary residual, and that tier
# exists only for lean spill layouts (lean_spill). Defined HERE, next to
# the tier gate that uses the same threshold, so the two numeric gates
# cannot drift apart (ADVICE r4 #1: previously they were coupled only by
# docstrings — a 257-512-spp chunk at K<=96 would park a ~26 GB residual).
HEAVY_CHUNK_CAP = 256
LEAN_CHUNK_CAP = 512


def boundary_residual_bytes(n_pix: int, chunk: int, chains: int,
                            max_depth: int, flags: dict) -> int:
    """Predicted HBM footprint of ONE train launch's segment-boundary
    buffer — the residual parked across the cotangent barrier by the
    chunked trainer's chunk 0 and resident during every backward call.

    Mirrors _fwd_call's shapes exactly: the buffer is
    (n_bounds * CROWS, n_lanes * TN) f32 with
    max_steps = chains * chunk * (max_depth + 2) + 1,
    n_bounds = ceil(max_steps / seg_k) and n_lanes the padded meta
    columns per chain. The K tiers were chosen to hold this ~constant
    in chunk (chunk/K ≈ 2.6 across tiers), so the footprint scales with
    IMAGE SIZE, not chunk: 1200x800 parks the proven 12.5 GB at 500 spp
    / K=192, while 1920x1080 would park ~27 GB at any chunk >= 128 —
    which is why diff.resolve_spp_chunk folds W*H into the chunk cap
    (VERDICT r4 next #4). Pinned to the measured 12.5 GB point by
    tests/test_tile_grad.py::test_boundary_residual_formula_pinned."""
    n_lanes = -(-n_pix // (chains * TN)) * TN
    max_steps = chains * chunk * (int(max_depth) + 2) + 1
    seg_k, _ = _seg_cfg(max_steps, chunk, flags)
    n_bounds = -(-max_steps // seg_k)
    return n_bounds * CROWS * n_lanes * 4


def lean_spill(has_quads: bool, has_boxes: bool, has_images: bool,
               n_media: int) -> bool:
    """True when the aux-spill replay record is lean enough (srows <=
    80: sphere-only and most sphere+one-extra-family scenes) for the
    K=192 segment tier — the gate _seg_cfg and the chunked trainer's
    chunk-size cap (diff.resolve_spp_chunk) must share, since a >256-spp
    chunk is only HBM-safe when K=192 halves its boundary residual."""
    spill_rows, _ = _spill_layout(has_quads, has_boxes, has_images,
                                  n_media > 0)
    return CROWS + spill_rows <= 80


def _seg_cfg(max_steps: int, spp: int, flags: dict):
    """(seg_k, vmem_limit_bytes) for the train kernels — the single
    source both _fwd_call and _bwd_call use so the forward's boundary
    stride always matches the backward's reload stride.

    The K=192 tier needs the backward's (K*srows, TN) replay scratch +
    the resident boundary block to fit the scoped-VMEM budget: with the
    aux-spill layout srows = 24 + spill rows (34-87 by family). At the
    lean gate's worst case (srows=80, TN=1024) the K=192 replay scratch
    is ~63 MB — boundary block and accumulators still fit under the
    raised 96 MB scoped limit, but with less headroom than the typical
    lean scene (sphere-only chap12: srows=58, ~46 MB); if a srows≈80
    scene ever fails to compile here, tighten the lean gate (ADVICE r4
    #3). Lean layouts (lean_spill) get K=192 under the 96 MB limit
    (v5e has 128 MB physical); heavier layouts cap at 96 under the
    standard 64 MB limit."""
    if spp > HEAVY_CHUNK_CAP and lean_spill(
            flags["has_quads"], flags["has_boxes"],
            flags["has_images"], flags["n_media"]):
        # Pin K=192 rather than following the sqrt rule: in this tier
        # HBM (the ceil(max_steps/K)-bound boundary buffer, parked
        # across the cotangent barrier) dominates, not VMEM balance —
        # sqrt would give K=168 at 500 spp, a 14.3 GB full-image
        # residual vs 12.5 GB at K=192 (the budget the chunk-0 parking
        # has been proven at). Scratch at K=192/srows<=80 is ~50 MB,
        # inside the raised 96 MB scoped limit.
        k = max(8, min(192, max_steps))
        if k > 96:
            return k, 96 * 1024 * 1024
        return k, _VMEM_LIMIT
    return _seg_k(max_steps, spp), _VMEM_LIMIT


def _pack_carry(rows_f, sample, chain, pxr, pyr, gidf, k0, k1):
    k0f = jax.lax.bitcast_convert_type(k0, jnp.float32)
    k1f = jax.lax.bitcast_convert_type(k1, jnp.float32)
    pad = jnp.zeros((1, TN), jnp.float32)
    return jnp.concatenate(
        list(rows_f) + [sample, chain, pxr, pyr, gidf, k0f, k1f, pad],
        axis=0)


def _unpack_carry(blk):
    rows_f = tuple(blk[i:i + 1] for i in range(16))
    sample = blk[16:17]
    chain = blk[17:18]
    pxr = blk[18:19]
    pyr = blk[19:20]
    gidf = blk[20:21]
    k0 = jax.lax.bitcast_convert_type(blk[21:22], jnp.uint32)
    k1 = jax.lax.bitcast_convert_type(blk[22:23], jnp.uint32)
    return rows_f, sample, chain, pxr, pyr, gidf, k0, k1


def _spill_layout(has_quads, has_boxes, has_images, n_media):
    """Row layout of the per-step aux spill appended to each replay-
    scratch record when aux_spill is on (VERDICT r3 #3's partial-spill
    trim): the replay loop runs _one_bounce anyway, so spilling the
    winner blocks + branch flags it produces lets the reverse sweep
    skip the second full intersection sweep (measured 0.80x of a
    forward on chap12, benchmarks/bwd_profile.py). Offsets are relative
    to the start of the spill block (i.e. after the CROWS carry rows).

    Returns (padded_rows, offsets dict). Flag booleans are packed into
    one f32 bit row (values < 2^13, exact in f32)."""
    off = {}
    r = 0
    for name, n in (("t_hit", 1), ("win_s", 1), ("flags", 1),
                    ("draws", 7), ("sel_s", 24)):
        off[name] = r
        r += n
    if has_quads:
        off["sel_q"] = r
        off["win_q"] = r + 24
        r += 25
    if has_boxes:
        off["sel_b"] = r
        off["win_b"] = r + 24
        r += 25
    if has_images:
        off["xi"] = r
        off["img_row"] = r + 1
        r += 2
    if n_media > 0:
        off["win_med"] = r
        r += 1
    return -(-r // 8) * 8, off


# Bit positions inside the packed flag row (order is load-bearing for
# replay/reverse agreement only — both sides use these constants).
_FLAG_BITS = ("hit", "miss", "survives", "front", "degen", "do_reflect",
              "use_c2", "use_q", "use_b", "use_med", "is_per", "is_img",
              "alive2")


def _pack_flags(vals: dict):
    acc = jnp.zeros_like(vals["hit"], jnp.float32)
    for i, name in enumerate(_FLAG_BITS):
        if name in vals:
            acc = acc + vals[name].astype(jnp.float32) * float(1 << i)
    return acc


def _unpack_flag(bits, name: str):
    i = _FLAG_BITS.index(name)
    return jnp.floor(bits / float(1 << i)) % 2.0 > 0.5


def _meta_at(meta_ref, chains, chain, row):
    """Per-lane meta `row` of each lane's current chain pixel (same
    select chain as the forward tile kernel)."""
    v = meta_ref[row:row + 1, pl.ds(0, TN)]
    for c in range(1, chains):
        v = jnp.where(chain == jnp.float32(c),
                      meta_ref[row:row + 1, pl.ds(c * TN, TN)], v)
    return v


def _advance(rows_f, rows2, sample, chain, pxr, pyr, gidf, k0, k1, *,
             meta_ref, cam_ref, s0, s1, lo, spp, chains):
    """The tile free-run's post-bounce state advance: flush decision,
    sample/chain stepping, key refresh, camera regeneration. Mirrors
    ops.megakernel._tile_render_kernel's body op-for-op so replay is
    bit-exact. Returns (new carry parts, flags for the adjoint)."""
    alive_in = rows_f[14] > 0.5
    alive2 = rows2[14]  # bool survives from _one_bounce
    die = alive_in & jnp.logical_not(alive2)
    last = sample >= jnp.float32(spp - 1)
    fin = die & last
    finf = fin.astype(jnp.float32)

    nxt = chain + finf
    nv = _meta_at(meta_ref, chains,
                  jnp.minimum(nxt, jnp.float32(chains - 1)), 3) > 0.5
    adv = fin & (chain < jnp.float32(chains - 1)) & nv
    regen = (die & jnp.logical_not(last)) | adv
    chain_n = chain + adv.astype(jnp.float32)
    sample_n = jnp.where(die & jnp.logical_not(last), sample + 1.0,
                         jnp.where(adv, 0.0, sample))
    pxr_n = jnp.where(adv, _meta_at(meta_ref, chains, chain_n, 0), pxr)
    pyr_n = jnp.where(adv, _meta_at(meta_ref, chains, chain_n, 1), pyr)
    gidf_n = jnp.where(adv, _meta_at(meta_ref, chains, chain_n, 2), gidf)
    gid = gidf_n.astype(jnp.int32).astype(jnp.uint32)

    k0n, k1n = rng.threefry2x32(
        s0, s1, gid, sample_n.astype(jnp.int32).astype(jnp.uint32) + lo)
    k0_n = jnp.where(regen, k0n, k0)
    k1_n = jnp.where(regen, k1n, k1)
    cox, coy, coz, cdx, cdy, cdz, ctm = mk._camera_rays(
        cam_ref, k0_n, k1_n, pxr_n, pyr_n)
    new = (jnp.where(regen, cox, rows2[0]),
           jnp.where(regen, coy, rows2[1]),
           jnp.where(regen, coz, rows2[2]),
           jnp.where(regen, cdx, rows2[3]),
           jnp.where(regen, cdy, rows2[4]),
           jnp.where(regen, cdz, rows2[5]),
           jnp.where(regen, ctm, rows2[6]),
           jnp.where(regen, 1.0, rows2[7]),
           jnp.where(regen, 1.0, rows2[8]),
           jnp.where(regen, 1.0, rows2[9]),
           rows2[10] * (1.0 - finf),
           rows2[11] * (1.0 - finf),
           rows2[12] * (1.0 - finf),
           jnp.where(regen, 0.0, rows2[13]),
           (alive2 | regen).astype(jnp.float32),
           rows2[15])
    flags = dict(finf=finf, regen=regen, chain=chain, k0_n=k0_n,
                 k1_n=k1_n, pxr_n=pxr_n, pyr_n=pyr_n)
    return (new, sample_n, chain_n, pxr_n, pyr_n, gidf_n, k0_n, k1_n), \
        flags


# ---------------------------------------------------------------------------
# Differentiable camera-ray math (AD twin of megakernel._camera_rays)
# ---------------------------------------------------------------------------


def _camera_draws(k0, k1):
    """The per-lane uniforms the thin-lens generator consumes — pure
    functions of the key words (replayed constants in the adjoint)."""
    us = []
    for pair in range(3):
        a, b = rng.threefry2x32(
            k0, k1, jnp.uint32(0),
            jnp.uint32(pair) * jnp.uint32(0x9E3779B9) + jnp.uint32(pair))
        us.append(rng._to_uniform(a))
        us.append(rng._to_uniform(b))
    jx, jy, u2, u3, time_u = us[0], us[1], us[2], us[3], us[4]
    r = jnp.sqrt(u2)
    theta = (2.0 * jnp.pi) * u3
    return jx, jy, r * jnp.cos(theta), r * jnp.sin(theta), time_u


def _camera_ray_rows(cam, pxr, pyr, draws):
    """Thin-lens ray from 24 (1,TN) camera rows — same expressions as
    megakernel._camera_rays but with the camera traced for jax.vjp."""
    jx, jy, dcx, dcy, time_u = draws
    s = (pxr + jx) / cam[21]
    t = ((cam[23] - pyr) + jy) / cam[22]
    rdx = cam[18] * dcx
    rdy = cam[18] * dcy
    ox = cam[0] + cam[12] * rdx + cam[15] * rdy
    oy = cam[1] + cam[13] * rdx + cam[16] * rdy
    oz = cam[2] + cam[14] * rdx + cam[17] * rdy
    dx = cam[3] + cam[6] * s + cam[9] * t - ox
    dy = cam[4] + cam[7] * s + cam[10] * t - oy
    dz = cam[5] + cam[8] * s + cam[11] * t - oz
    tm = cam[19] + cam[20] * time_u
    return ox, oy, oz, dx, dy, dz, tm


# ---------------------------------------------------------------------------
# Forward: tile free-run with segment-boundary spill
# ---------------------------------------------------------------------------


def _train_fwd_kernel(meta_ref, seed_ref, cam_ref, sph_ref, quad_ref,
                      box_ref, med_ref, atlas_ref, bg_ref, sb_ref,
                      qb_ref, bb_ref,
                      out_ref, bounds_ref, *, spp, chains, max_steps,
                      seg_k, s_tiles, q_tiles, b_tiles, moving,
                      has_quads, has_boxes, has_rot_boxes, has_perlin,
                      has_images, img_ah, img_aw, n_media, t_min,
                      max_depth, cull_s, cull_q, cull_b, fam_n=None,
                      rr_depth=0):
    s0 = seed_ref[0]
    s1 = seed_ref[1]
    lo = seed_ref[2]
    bk = dict(s_tiles=s_tiles, q_tiles=q_tiles, moving=moving,
              has_quads=has_quads, has_perlin=has_perlin,
              has_images=has_images, img_ah=img_ah, img_aw=img_aw,
              n_media=n_media, t_min=t_min, max_depth=max_depth,
              sb_ref=sb_ref, qb_ref=qb_ref, cull_s=cull_s, cull_q=cull_q,
              box_ref=box_ref, b_tiles=b_tiles, has_boxes=has_boxes,
              has_rot_boxes=has_rot_boxes, bb_ref=bb_ref, cull_b=cull_b,
              fam_n=fam_n, rr_depth=rr_depth)
    adv_kw = dict(meta_ref=meta_ref, cam_ref=cam_ref, s0=s0, s1=s1,
                  lo=lo, spp=spp, chains=chains)

    out_ref[:, :] = jnp.zeros(out_ref.shape, jnp.float32)

    chain0 = jnp.zeros((1, TN), jnp.float32)
    pxr = _meta_at(meta_ref, chains, chain0, 0)
    pyr = _meta_at(meta_ref, chains, chain0, 1)
    gidf = _meta_at(meta_ref, chains, chain0, 2)
    valid = _meta_at(meta_ref, chains, chain0, 3) > 0.5
    gid = gidf.astype(jnp.int32).astype(jnp.uint32)

    zeros = jnp.zeros((1, TN), jnp.float32)
    ones = jnp.ones((1, TN), jnp.float32)
    k0, k1 = rng.threefry2x32(s0, s1, gid, lo)
    ox, oy, oz, dx, dy, dz, tm = mk._camera_rays(cam_ref, k0, k1, pxr,
                                                 pyr)
    rows0 = (ox, oy, oz, dx, dy, dz, tm, ones, ones, ones,
             zeros, zeros, zeros, zeros, valid.astype(jnp.float32),
             zeros)
    carry0 = rows0 + (zeros, chain0, pxr, pyr, gidf, k0, k1,
                      jnp.zeros((), jnp.int32))

    def cond(carry):
        return jnp.any(carry[14] > 0.5) & (carry[23] < max_steps)

    def body(carry):
        rows_f = carry[:16]
        sample, chain, pxr, pyr, gidf = carry[16:21]
        k0, k1, kstep = carry[21], carry[22], carry[23]

        # Segment-boundary spill: the carry entering step kstep.
        @pl.when(kstep % seg_k == 0)
        def _():
            bounds_ref[pl.ds(
                pl.multiple_of((kstep // seg_k) * CROWS, 8), CROWS),
                :] = _pack_carry(rows_f, sample, chain, pxr, pyr, gidf,
                                 k0, k1)

        rows = rows_f[:14] + (rows_f[14] > 0.5,) + rows_f[15:]
        rows2, _ = mk._one_bounce(rows, k0, k1, sph_ref, quad_ref,
                                  med_ref, atlas_ref, bg_ref, **bk)
        (new, sample_n, chain_n, pxr_n, pyr_n, gidf_n, k0_n,
         k1_n), fl = _advance(rows_f, rows2, sample, chain, pxr, pyr,
                              gidf, k0, k1, **adv_kw)

        # Flush finished pixels' radiance into their chain's out block.
        finf = fl["finf"]
        for c in range(chains):
            m = finf * (chain == jnp.float32(c)).astype(jnp.float32)
            out_ref[0:3, pl.ds(c * TN, TN)] += jnp.concatenate(
                [rows2[10] * m, rows2[11] * m, rows2[12] * m], axis=0)

        return new + (sample_n, chain_n, pxr_n, pyr_n, gidf_n, k0_n,
                      k1_n, kstep + 1)

    end = jax.lax.while_loop(cond, body, carry0)
    out_ref[3:4, pl.ds(0, TN)] = end[15]  # per-lane traced counts
    out_ref[4:5, pl.ds(0, TN)] = jnp.full(  # executed step count
        (1, TN), end[23].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Backward: segmented replay + in-kernel adjoint
# ---------------------------------------------------------------------------


def _train_bwd_kernel(meta_ref, drad_ref, nsteps_ref, seed_ref, cam_ref,
                      sph_ref, quad_ref, box_ref, med_ref, atlas_ref,
                      bg_ref, sb_ref, qb_ref, bb_ref, bounds_ref,
                      dsph_ref, dquad_ref, dbox_ref, dbg_ref, datlas_ref,
                      dcam_ref, dmed_ref, steps_ref, *, spp, chains,
                      seg_k,
                      n_bounds, s_tiles, q_tiles, b_tiles, moving,
                      has_quads, has_boxes, has_rot_boxes, has_perlin,
                      has_images, img_ah, img_aw, n_media, t_min,
                      max_depth, cull_s, cull_q, cull_b, fam_n=None,
                      rr_depth=0, ablate=None, aux_spill=False):
    # `ablate` is a MEASUREMENT-ONLY knob (benchmarks/bwd_profile.py,
    # VERDICT r3 #3): "replay" stops after the segment replay loops,
    # "rederive" adds the reverse sweep's aux re-derivation but skips
    # the jax.vjp transpose + pack scatters. Both produce garbage
    # gradients (a tiny anti-DCE accumulation keeps the loops live);
    # production (tile_train_chain) always passes None.
    #
    # `aux_spill` trades replay-scratch VMEM traffic for the reverse
    # sweep's re-derivation: the replay loop spills the winner blocks +
    # branch flags _one_bounce produces anyway, and the reverse sweep
    # reconstructs `aux` from the spill instead of re-running the full
    # intersection sweep (0.83x of a forward on chap12; the spill
    # writes themselves measure free — benchmarks/bwd_profile.py).
    if aux_spill:
        spill_rows, soff = _spill_layout(has_quads, has_boxes,
                                         has_images, n_media > 0)
    else:
        spill_rows, soff = 0, None
    srows = CROWS + spill_rows
    @pl.when(pl.program_id(0) == 0)
    def _():
        dsph_ref[:, :] = jnp.zeros(dsph_ref.shape, jnp.float32)
        dquad_ref[:, :] = jnp.zeros(dquad_ref.shape, jnp.float32)
        dbox_ref[:, :] = jnp.zeros(dbox_ref.shape, jnp.float32)
        dbg_ref[:, :] = jnp.zeros(dbg_ref.shape, jnp.float32)
        datlas_ref[:, :] = jnp.zeros(datlas_ref.shape, jnp.float32)
        dcam_ref[:, :] = jnp.zeros(dcam_ref.shape, jnp.float32)
        dmed_ref[:, :] = jnp.zeros(dmed_ref.shape, jnp.float32)

    s0 = seed_ref[0]
    s1 = seed_ref[1]
    lo = seed_ref[2]
    n_steps = nsteps_ref[0, pl.program_id(0)]
    bk = dict(s_tiles=s_tiles, q_tiles=q_tiles, moving=moving,
              has_quads=has_quads, has_perlin=has_perlin,
              has_images=has_images, img_ah=img_ah, img_aw=img_aw,
              n_media=n_media, t_min=t_min, max_depth=max_depth,
              sb_ref=sb_ref, qb_ref=qb_ref, cull_s=cull_s, cull_q=cull_q,
              box_ref=box_ref, b_tiles=b_tiles, has_boxes=has_boxes,
              has_rot_boxes=has_rot_boxes, bb_ref=bb_ref, cull_b=cull_b,
              fam_n=fam_n, rr_depth=rr_depth)
    adv_kw = dict(meta_ref=meta_ref, cam_ref=cam_ref, s0=s0, s1=s1,
                  lo=lo, spp=spp, chains=chains)

    cam_rows = tuple(jnp.full((1, TN), cam_ref[i], jnp.float32)
                     for i in range(24))
    bg6 = tuple(jnp.full((1, TN), bg_ref[i], jnp.float32)
                for i in range(6))
    is_sky = bg_ref[6] < 0.5
    atlas = atlas_ref[:, :] if has_images else None
    # Traced medium parameter rows (the 11 continuous columns of the
    # pack_media layout) + replayed per-medium constants.
    MED_COLS = (1, 2, 3, 4, 5, 6, 7, 17, 19, 20, 21)
    med_rows = [tuple(jnp.full((1, TN), med_ref[mi, col], jnp.float32)
                      for col in MED_COLS) for mi in range(n_media)]
    med_is_sph = [jnp.full((1, TN), med_ref[mi, 0], jnp.float32) < 0.5
                  for mi in range(n_media)]
    med_rot = [[med_ref[mi, 8 + j] for j in range(9)]
               for mi in range(n_media)]

    zrow = jnp.zeros((1, TN), jnp.float32)
    carry0 = tuple(zrow for _ in range(13))  # d_state
    carry0 += tuple(zrow for _ in range(6))  # d_bg
    carry0 += tuple(zrow for _ in range(24))  # d_cam (lane-parallel)
    if has_images:
        carry0 += (jnp.zeros(atlas.shape, jnp.float32),)
    carry0 += tuple(zrow for _ in range(11 * n_media))  # d_med
    med_off = 43 + (1 if has_images else 0)

    n_segs = (n_steps + seg_k - 1) // seg_k

    def drad_at(chain, row):
        v = drad_ref[row:row + 1, pl.ds(0, TN)]
        for c in range(1, chains):
            v = jnp.where(chain == jnp.float32(c),
                          drad_ref[row:row + 1, pl.ds(c * TN, TN)], v)
        return v

    def seg_body(i, carry):
        seg = n_segs - 1 - i
        base = seg * seg_k
        nk = jnp.minimum(seg_k, n_steps - base)
        bblk = bounds_ref[pl.ds(pl.multiple_of(seg * CROWS, 8), CROWS),
                          :]

        # --- replay the segment's steps into VMEM scratch -------------
        def rep(k, rc):
            steps_ref[pl.ds(pl.multiple_of(k * srows, 8), CROWS), :] = \
                _pack_carry(*rc)
            rows_f, sample, chain, pxr, pyr, gidf, k0, k1 = rc
            rows = rows_f[:14] + (rows_f[14] > 0.5,) + rows_f[15:]
            rows2, rep_aux = mk._one_bounce(
                rows, k0, k1, sph_ref, quad_ref, med_ref, atlas_ref,
                bg_ref, want_aux=aux_spill, **bk)
            if aux_spill:
                flag_vals = {n: rep_aux[n] for n in _FLAG_BITS
                             if n in rep_aux}
                flag_vals["alive2"] = rows2[14]
                parts = [rep_aux["t_hit"], rep_aux["win_s"],
                         _pack_flags(flag_vals)]
                parts += list(rep_aux["draws"])
                parts.append(rep_aux["sel_s"])
                if has_quads:
                    parts += [rep_aux["sel_q"], rep_aux["win_q"]]
                if has_boxes:
                    parts += [rep_aux["sel_b"], rep_aux["win_b"]]
                if has_images:
                    # int32 texel ids, exact in f32 (atlas < 2^24 texels)
                    parts += [rep_aux["xi"].astype(jnp.float32),
                              rep_aux["img_row"].astype(jnp.float32)]
                if n_media > 0:
                    parts.append(rep_aux["win_med"])
                blk = jnp.concatenate(parts, axis=0)
                pad = spill_rows - blk.shape[0]
                if pad:
                    blk = jnp.concatenate(
                        [blk, jnp.zeros((pad, TN), jnp.float32)], axis=0)
                steps_ref[pl.ds(pl.multiple_of(k * srows + CROWS, 8),
                                spill_rows), :] = blk
            nxt, _ = _advance(rows_f, rows2, sample, chain, pxr, pyr,
                              gidf, k0, k1, **adv_kw)
            return nxt

        rc0 = _unpack_carry(bblk)
        jax.lax.fori_loop(0, nk, rep, rc0)

        if ablate == "replay":
            # Consume the replayed scratch so Mosaic keeps the loop.
            blk0 = steps_ref[pl.ds(0, CROWS), :]
            return (carry[0] + blk0[0:1] * jnp.float32(1e-30),) \
                + carry[1:]

        # --- reverse sweep over the segment's steps --------------------
        def rev(j, dc):
            k = nk - 1 - j
            blk = steps_ref[pl.ds(pl.multiple_of(k * srows, 8), srows),
                            :]
            rows_f, sample, chain, pxr, pyr, gidf, k0, k1 = \
                _unpack_carry(blk[:CROWS])
            rows = rows_f[:14] + (rows_f[14] > 0.5,) + rows_f[15:]
            if aux_spill:
                # Reconstruct aux from the replay spill — no second
                # intersection sweep.
                sp = blk[CROWS:]

                def srow(name, n=1):
                    return sp[soff[name]:soff[name] + n]

                bits = srow("flags")
                aux = dict(
                    t_hit=srow("t_hit"), win_s=srow("win_s"),
                    sel_s=srow("sel_s", 24),
                    draws=tuple(sp[soff["draws"] + i:
                                   soff["draws"] + i + 1]
                                for i in range(7)))
                for name in ("hit", "miss", "survives", "front",
                             "degen", "do_reflect", "use_c2"):
                    aux[name] = _unpack_flag(bits, name)
                if has_quads:
                    aux["sel_q"] = srow("sel_q", 24)
                    aux["win_q"] = srow("win_q")
                    aux["use_q"] = _unpack_flag(bits, "use_q")
                else:
                    aux["sel_q"] = jnp.zeros((24, TN), jnp.float32)
                    aux["use_q"] = jnp.zeros((1, TN), bool)
                if has_boxes:
                    aux["sel_b"] = srow("sel_b", 24)
                    aux["win_b"] = srow("win_b")
                    aux["use_b"] = _unpack_flag(bits, "use_b")
                if has_perlin:
                    aux["is_per"] = _unpack_flag(bits, "is_per")
                if has_images:
                    aux["is_img"] = _unpack_flag(bits, "is_img")
                    aux["xi"] = srow("xi").astype(jnp.int32)
                    aux["img_row"] = srow("img_row").astype(jnp.int32)
                if n_media > 0:
                    aux["use_med"] = _unpack_flag(bits, "use_med")
                    aux["win_med"] = srow("win_med")
                alive2 = _unpack_flag(bits, "alive2")
                # _advance only reads rows2[14] (and rows the unused
                # `new` carry consumes — DCE'd); stub the rest.
                rows2 = rows_f[:14] + (alive2,) + rows_f[15:]
            else:
                rows2, aux = mk._one_bounce(
                    rows, k0, k1, sph_ref, quad_ref, med_ref, atlas_ref,
                    bg_ref, want_aux=True, **bk)
            _, fl = _advance(rows_f, rows2, sample, chain, pxr, pyr,
                             gidf, k0, k1, **adv_kw)

            if ablate == "rederive":
                # Consume the re-derived winner block + advance flags so
                # the sweep isn't dead, then skip the vjp transpose.
                probe = (aux["sel_s"][0:1] + aux["t_hit"]
                         + fl["finf"]) * jnp.float32(1e-30)
                return (dc[0] + probe,) + dc[1:]

            sel_s = aux["sel_s"]
            sel_q = aux["sel_q"]
            mtype = sel_s[8:9]
            if has_boxes:
                sel_b = aux["sel_b"]
                mtype = jnp.where(aux["use_b"], sel_b[9:10], mtype)
            if has_quads:
                mtype = jnp.where(aux["use_q"], sel_q[14:15], mtype)
            if n_media > 0:
                mtype = jnp.where(aux["use_med"],
                                  jnp.float32(MAT_ISOTROPIC), mtype)
            consts = dict(
                t_hit=aux["t_hit"], use_q=aux["use_q"], hit=aux["hit"],
                miss=aux["miss"], survives=aux["survives"],
                front=aux["front"], degen=aux["degen"],
                do_reflect=aux["do_reflect"], use_c2=aux["use_c2"],
                draws=aux["draws"], is_sky=is_sky,
                is_lam=mtype == MAT_LAMBERTIAN,
                is_met=mtype == MAT_METAL,
                is_die=mtype == MAT_DIELECTRIC,
                is_light=mtype == MAT_DIFFUSE_LIGHT)
            if has_boxes:
                consts["use_b"] = aux["use_b"]
            if has_perlin:
                consts["is_per"] = aux["is_per"]
            if has_images:
                consts["is_img"] = aux["is_img"]
                consts["xi"] = aux["xi"]
                consts["img_row"] = aux["img_row"]
            if n_media > 0:
                consts["use_med"] = aux["use_med"]
                consts["win_med"] = aux["win_med"]
                consts["med_is_sph"] = med_is_sph
                consts["med_rot"] = med_rot
                # The medium-interaction uniforms: same counter
                # addressing as the forward's in-kernel draws.
                cm = (rows_f[13].astype(jnp.int32).astype(jnp.uint32)
                      * jnp.uint32(rng._NUM_STREAMS)
                      + jnp.uint32(rng.STREAM_MEDIUM))
                logu = []
                for pair in range((n_media + 1) // 2):
                    a_w, b_w = rng.threefry2x32(
                        k0, k1, cm,
                        jnp.uint32(pair) * jnp.uint32(0x9E3779B9)
                        + jnp.uint32(pair))
                    logu.append(jnp.log(jnp.maximum(
                        rng._to_uniform(a_w), 1e-12)))
                    logu.append(jnp.log(jnp.maximum(
                        rng._to_uniform(b_w), 1e-12)))
                consts["med_logu"] = logu
            if rr_depth:
                # Bounce row of the step's input state (same compare as
                # the kernel's RR block; the kill is already in
                # consts["survives"], this only gates the 1/p weight).
                consts["rr_on"] = rows_f[13] >= jnp.float32(rr_depth)

            g = mkv._make_diff_step(
                consts, moving=moving, has_quads=has_quads,
                has_boxes=has_boxes, has_rot_boxes=has_rot_boxes,
                has_perlin=has_perlin, has_images=has_images,
                img_ah=img_ah, img_aw=img_aw, n_media=n_media,
                t_min=t_min, rr_depth=rr_depth)

            finf = fl["finf"]
            regf = fl["regen"].astype(jnp.float32)
            draws_n = _camera_draws(fl["k0_n"], fl["k1_n"])
            pxr_n, pyr_n = fl["pxr_n"], fl["pyr_n"]
            n_g = 14 + (1 if has_quads else 0) + (1 if has_boxes else 0) \
                + 6 + (1 if has_images else 0) + 11 * n_media

            def g2(*args):
                out13 = g(*args[:n_g])
                cam = args[n_g:n_g + 24]
                flush = (out13[10] * finf, out13[11] * finf,
                         out13[12] * finf)
                cox, coy, coz, cdx, cdy, cdz, ctm = _camera_ray_rows(
                    cam, pxr_n, pyr_n, draws_n)
                nxt = (regf * cox + (1.0 - regf) * out13[0],
                       regf * coy + (1.0 - regf) * out13[1],
                       regf * coz + (1.0 - regf) * out13[2],
                       regf * cdx + (1.0 - regf) * out13[3],
                       regf * cdy + (1.0 - regf) * out13[4],
                       regf * cdz + (1.0 - regf) * out13[5],
                       regf * ctm + (1.0 - regf) * out13[6],
                       (1.0 - regf) * out13[7],
                       (1.0 - regf) * out13[8],
                       (1.0 - regf) * out13[9],
                       out13[10] * (1.0 - finf),
                       out13[11] * (1.0 - finf),
                       out13[12] * (1.0 - finf))
                return nxt + flush

            diff_ins = list(rows_f[:13]) + [sel_s]
            if has_quads:
                diff_ins.append(sel_q)
            if has_boxes:
                diff_ins.append(sel_b)
            diff_ins += list(bg6)
            if has_images:
                diff_ins.append(atlas)
            for mi in range(n_media):
                diff_ins += list(med_rows[mi])
            diff_ins += list(cam_rows)

            d_flush = tuple(drad_at(chain, r) for r in range(3))
            _, vjp_fn = jax.vjp(g2, *diff_ins)
            grads = vjp_fn(tuple(dc[:13]) + d_flush)

            d13 = tuple(grads[:13])
            d_sel_s = grads[13]
            gi = 14
            if has_quads:
                d_sel_q = grads[gi]
                gi += 1
            if has_boxes:
                d_sel_b = grads[gi]
                gi += 1
            dbg_new = tuple(dc[13 + ci] + grads[gi + ci]
                            for ci in range(6))
            gi += 6
            if has_images:
                datlas_new = dc[43] + grads[gi]
                gi += 1
            dmed_new = tuple(dc[med_off + ci] + grads[gi + ci]
                             for ci in range(11 * n_media))
            gi += 11 * n_media
            dcam_new = tuple(dc[19 + ci] + grads[gi + ci]
                             for ci in range(24))

            # Winner-attribute cotangents -> primitive packs (transpose
            # of the forward's one-hot selection; MXU contraction).
            win_s = aux["win_s"].astype(jnp.int32)

            def scat(dref, d_sel, win, n_tiles):
                w = mk._fam_width(dref.shape[1])

                def sc(si, _):
                    off = pl.multiple_of(si * w, w)
                    rows_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (w, TN), 0)
                    oh = (rows_iota == (win - si * w)).astype(
                        jnp.float32)
                    dref[:, pl.ds(off, w)] += mk._onehot_dot(
                        d_sel, oh, (((1,), (1,)), ((), ())))
                    return 0
                jax.lax.fori_loop(0, n_tiles, sc, 0)

            scat(dsph_ref, d_sel_s, win_s, s_tiles)
            if has_quads:
                scat(dquad_ref, d_sel_q, aux["win_q"].astype(jnp.int32),
                     q_tiles)
            if has_boxes:
                scat(dbox_ref, d_sel_b, aux["win_b"].astype(jnp.int32),
                     b_tiles)

            out = d13 + dbg_new + dcam_new
            if has_images:
                out = out + (datlas_new,)
            out = out + dmed_new
            return out

        return jax.lax.fori_loop(0, nk, rev, carry)

    carry = jax.lax.fori_loop(0, n_segs, seg_body, carry0)

    # --- initial camera-ray generation (step -1): d_state -> d_cam -----
    chain0 = jnp.zeros((1, TN), jnp.float32)
    pxr0 = _meta_at(meta_ref, chains, chain0, 0)
    pyr0 = _meta_at(meta_ref, chains, chain0, 1)
    gid0 = _meta_at(meta_ref, chains, chain0, 2).astype(
        jnp.int32).astype(jnp.uint32)
    k0i, k1i = rng.threefry2x32(s0, s1, gid0, lo)
    draws0 = _camera_draws(k0i, k1i)

    def g0(*cam):
        return _camera_ray_rows(cam, pxr0, pyr0, draws0)

    _, vjp0 = jax.vjp(g0, *cam_rows)
    dcam0 = vjp0(tuple(carry[:7]))

    dbg_ref[:, :] += jnp.concatenate(
        list(carry[13:19]) + [jnp.zeros((2, TN), jnp.float32)], axis=0)
    dcam_ref[:, :] += jnp.concatenate(
        [carry[19 + i] + dcam0[i] for i in range(24)], axis=0)
    if has_images:
        datlas_ref[:, :] += carry[43]
    if n_media > 0:
        # Scatter the 11 continuous columns back into the (D, 24)
        # pack_media layout (lane-parallel; reduced in XLA).
        MED_COLS = (1, 2, 3, 4, 5, 6, 7, 17, 19, 20, 21)
        for mi in range(n_media):
            for j, col in enumerate(MED_COLS):
                dmed_ref[mi * 24 + col: mi * 24 + col + 1, :] += \
                    carry[med_off + mi * 11 + j]


# ---------------------------------------------------------------------------
# custom_vjp wrapper over the packed operands
# ---------------------------------------------------------------------------


# Gradient scope for constant media: one slot per medium the scene
# representation itself sizes for (SceneArrays pads media to 8 slots).
# Each medium adds 11 traced rows to the reverse-sweep carry (~44 KB at
# TN=1024 — noise next to the ~50 MB replay scratch) plus one
# compute-all-select branch in the in-kernel adjoint, so the cost is
# linear and small; round 4's cap of 4 was a static choice with no
# measured wall behind it (VERDICT r4 weak #4 / next #5 — measured at 6
# media in BASELINE.md "Media gradient scope"). Scenes beyond 8 media
# fall back to the XLA scan path.
MAX_TRAIN_MEDIA = 8


def supports_train(scene) -> bool:
    """Tile-train-kernel gradient scope: everything the forward
    megakernel shades, including constant media up to MAX_TRAIN_MEDIA
    slots (each medium adds 11 traced rows to the in-kernel adjoint).
    The only remaining scope cliff vs the forward kernel is media count
    > 8; image-on-media already forces the forward kernel's own XLA
    fallback (mk.supports), so the train scope equals the forward scope
    for every scene with <= 8 media."""
    return mk.supports(scene) and scene.n_media_active <= MAX_TRAIN_MEDIA


def _fwd_call(meta, seed2, cam24, sph24, quad24, box24, med24, bg8,
              atlas, sb, qb, bb, *, spp, chains, **flags):
    npad = meta.shape[1]
    block = chains * TN
    s_count = sph24.shape[1]
    q_count = quad24.shape[1]
    b_count = box24.shape[1]
    max_steps = chains * spp * (int(flags["max_depth"]) + 2) + 1
    seg_k, vmem_limit = _seg_cfg(max_steps, spp, flags)
    n_bounds = -(-max_steps // seg_k)
    s_tiles = mk._fam_tiles(s_count)
    q_tiles = mk._fam_tiles(q_count)
    b_tiles = mk._fam_tiles(b_count)
    cull_s = s_tiles >= mk.CULL_MIN_TILES
    cull_q = flags["has_quads"] and q_tiles >= mk.CULL_MIN_TILES
    cull_b = flags["has_boxes"] and b_tiles >= mk.CULL_MIN_TILES

    kern = functools.partial(
        _train_fwd_kernel, spp=spp, chains=chains, max_steps=max_steps,
        seg_k=seg_k, s_tiles=s_tiles, q_tiles=q_tiles,
        b_tiles=b_tiles, cull_s=cull_s, cull_q=cull_q,
        cull_b=cull_b, **flags)
    n_lanes = npad // chains
    with jax.named_scope("mkt_fwd_spill"):
        return _fwd_launch(kern, meta, seed2, cam24, sph24, quad24,
                           box24, med24, bg8, atlas, sb, qb, bb,
                           npad=npad, block=block, s_count=s_count,
                           q_count=q_count, b_count=b_count,
                           n_bounds=n_bounds, n_lanes=n_lanes, spp=spp,
                           vmem_limit=vmem_limit)


def _fwd_launch(kern, meta, seed2, cam24, sph24, quad24, box24, med24,
                bg8, atlas, sb, qb, bb, *, npad, block, s_count,
                q_count, b_count, n_bounds, n_lanes, spp,
                vmem_limit=_VMEM_LIMIT):
    out, bounds = mk.pallas_call(
        kern,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((24, s_count), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, q_count), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, b_count), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(atlas.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bounds * CROWS, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
            jax.ShapeDtypeStruct((n_bounds * CROWS, n_lanes),
                                 jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=spp * 3 * 40 * npad * (s_count + q_count + b_count),
            bytes_accessed=4 * (9 * npad + n_bounds * CROWS * n_lanes
                                + 24 * (s_count + q_count + b_count)),
            transcendentals=spp * 3 * npad * 40),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
    )(meta, seed2, cam24, sph24, quad24, box24, med24, atlas, bg8, sb,
      qb, bb)
    return out, bounds


def _bwd_call(meta, drad, nsteps, seed2, cam24, sph24, quad24, box24,
              med24, bg8, atlas, sb, qb, bb, bounds, *, spp, chains,
              ablate=None, aux_spill=False, **flags):
    npad = meta.shape[1]
    block = chains * TN
    s_count = sph24.shape[1]
    q_count = quad24.shape[1]
    b_count = box24.shape[1]
    max_steps = chains * spp * (int(flags["max_depth"]) + 2) + 1
    seg_k, vmem_limit = _seg_cfg(max_steps, spp, flags)
    n_bounds = -(-max_steps // seg_k)
    s_tiles = mk._fam_tiles(s_count)
    q_tiles = mk._fam_tiles(q_count)
    b_tiles = mk._fam_tiles(b_count)
    cull_s = s_tiles >= mk.CULL_MIN_TILES
    cull_q = flags["has_quads"] and q_tiles >= mk.CULL_MIN_TILES
    cull_b = flags["has_boxes"] and b_tiles >= mk.CULL_MIN_TILES

    kern = functools.partial(
        _train_bwd_kernel, spp=spp, chains=chains, seg_k=seg_k,
        n_bounds=n_bounds, s_tiles=s_tiles,
        q_tiles=q_tiles, b_tiles=b_tiles, cull_s=cull_s,
        cull_q=cull_q, cull_b=cull_b, ablate=ablate,
        aux_spill=aux_spill, **flags)
    if aux_spill:
        spill_rows, _ = _spill_layout(
            flags["has_quads"], flags["has_boxes"], flags["has_images"],
            flags["n_media"] > 0)
    else:
        spill_rows = 0
    srows = CROWS + spill_rows

    md = max(1, flags["n_media"])
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    with jax.named_scope("mkt_bwd_replay_adjoint"):
        outs = _bwd_launch(
            kern, meta, drad, nsteps, seed2, cam24, sph24, quad24,
            box24, med24, bg8, atlas, sb, qb, bb, bounds, acc=acc,
            npad=npad, block=block, s_count=s_count, q_count=q_count,
            b_count=b_count, n_bounds=n_bounds, seg_k=seg_k, md=md,
            spp=spp, chains=chains, srows=srows,
            vmem_limit=vmem_limit)
    return outs


def _bwd_launch(kern, meta, drad, nsteps, seed2, cam24, sph24, quad24,
                box24, med24, bg8, atlas, sb, qb, bb, bounds, *, acc,
                npad, block, s_count, q_count, b_count, n_bounds, seg_k,
                md, spp, chains, srows=CROWS, vmem_limit=_VMEM_LIMIT):
    outs = mk.pallas_call(
        kern,
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            acc((24, s_count)),
            acc((24, q_count)),
            acc((24, b_count)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            acc(atlas.shape),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_bounds * CROWS, TN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            acc((24, s_count)),
            acc((24, q_count)),
            acc((24, b_count)),
            acc((8, TN)),
            acc(atlas.shape),
            acc((24, TN)),
            acc((md * 24, TN)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((24, s_count), jnp.float32),
            jax.ShapeDtypeStruct((24, q_count), jnp.float32),
            jax.ShapeDtypeStruct((24, b_count), jnp.float32),
            jax.ShapeDtypeStruct((8, TN), jnp.float32),
            jax.ShapeDtypeStruct(atlas.shape, jnp.float32),
            jax.ShapeDtypeStruct((24, TN), jnp.float32),
            jax.ShapeDtypeStruct((md * 24, TN), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((seg_k * srows, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * spp * 3 * 40 * npad
            * (s_count + q_count + b_count),
            bytes_accessed=4 * (9 * npad
                                + 2 * n_bounds * CROWS * npad // chains
                                + 24 * (s_count + q_count + b_count)),
            transcendentals=3 * spp * 3 * npad * 40),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
    )(meta, drad, nsteps, seed2, cam24, sph24, quad24, box24, med24,
      atlas, bg8, sb, qb, bb, bounds)
    return outs


@functools.lru_cache(maxsize=None)
def tile_train_chain(spp: int, chains: int, moving: bool,
                     has_quads: bool, has_boxes: bool,
                     has_rot_boxes: bool, has_perlin: bool,
                     has_images: bool, img_ah: int, img_aw: int,
                     max_depth: int, t_min: float, n_media: int = 0,
                     fam_n=None, aux_spill: bool | None = None,
                     rr_depth: int = 0):
    """The tile-resident renderer as a reverse-differentiable primitive.

    chain(meta, seed2, cam24, sph24, quad24, box24, med24, bg8, atlas,
    sb, qb, bb) -> out (8, NP) [rows 0-2 radiance sums, row 3 traced
    counts]. Forward = one spill-augmented render_tiles launch;
    backward = one segmented replay+adjoint launch producing cotangents
    for cam24 and every primitive/medium pack — scene/camera gradients
    then flow through the (tiny, dense) XLA transposes of the pack_*
    functions.

    rr_depth: Russian roulette (round 4) — the forward spill kernel
    kills via megakernel._one_bounce's RR block, the replay re-draws
    the same STREAM_RR coins, and the reverse sweep applies the 1/p
    weight DETACHED (megakernel_vjp._make_diff_step), keeping gradients
    in the detached-sampling class. On the 500-spp north star both the
    forward chunks and the backward replays shed their straggler tails.

    aux_spill (None = RRT_AUX_SPILL env, default on): the backward
    spills winner blocks from the replay loop instead of re-running the
    intersection sweep in the reverse sweep. Measured on chap12
    1200x800@8spp depth 50 (benchmarks/bwd_profile.py, v5e): backward
    launch 0.921 s -> 0.612 s (2.70x -> 1.79x of the 0.341 s forward;
    whole train step 3.7x -> 2.86x), with the replay's extra spill
    writes free (1.291x -> 1.281x — hidden in VPU-bound slack).
    RRT_AUX_SPILL=0 restores the re-derivation backward."""
    if aux_spill is None:
        aux_spill = os.environ.get("RRT_AUX_SPILL", "1") == "1"
    flags = dict(moving=moving, has_quads=has_quads, has_boxes=has_boxes,
                 has_rot_boxes=has_rot_boxes, has_perlin=has_perlin,
                 has_images=has_images, img_ah=img_ah, img_aw=img_aw,
                 n_media=n_media, t_min=t_min, max_depth=float(max_depth),
                 fam_n=fam_n, rr_depth=rr_depth)

    @jax.custom_vjp
    def chain(meta, seed2, cam24, sph24, quad24, box24, med24, bg8,
              atlas, sb, qb, bb):
        out, _ = _fwd_call(meta, seed2, cam24, sph24, quad24, box24,
                           med24, bg8, atlas, sb, qb, bb, spp=spp,
                           chains=chains, **flags)
        return out

    def fwd(meta, seed2, cam24, sph24, quad24, box24, med24, bg8,
            atlas, sb, qb, bb):
        out, bounds = _fwd_call(meta, seed2, cam24, sph24, quad24,
                                box24, med24, bg8, atlas, sb, qb, bb,
                                spp=spp, chains=chains, **flags)
        block = chains * TN
        nsteps = out[4].reshape(-1, block)[:, 0].astype(jnp.int32)[None]
        return out, (meta, seed2, cam24, sph24, quad24, box24, med24,
                     bg8, atlas, sb, qb, bb, bounds, nsteps)

    def bwd(res, d_out):
        (meta, seed2, cam24, sph24, quad24, box24, med24, bg8, atlas,
         sb, qb, bb, bounds, nsteps) = res
        drad = d_out[0:4]
        dsph, dquad, dbox, dbg_l, datlas, dcam_l, dmed_l = _bwd_call(
            meta, drad, nsteps, seed2, cam24, sph24, quad24, box24,
            med24, bg8, atlas, sb, qb, bb, bounds, spp=spp,
            chains=chains, aux_spill=aux_spill, **flags)
        dcam24 = jnp.sum(dcam_l, axis=1)
        dbg8 = jnp.sum(dbg_l, axis=1)
        if n_media > 0:
            dmed24 = jnp.sum(
                dmed_l.reshape(-1, 24, TN), axis=2)[:n_media]
            dmed24 = jnp.concatenate(
                [dmed24, jnp.zeros((med24.shape[0] - n_media, 24),
                                   jnp.float32)], axis=0) \
                if med24.shape[0] > n_media else dmed24
        else:
            dmed24 = jnp.zeros_like(med24)
        d_seed = np.zeros(seed2.shape, jax.dtypes.float0)
        return (jnp.zeros_like(meta), d_seed, dcam24, dsph, dquad, dbox,
                dmed24, dbg8, datlas, jnp.zeros_like(sb),
                jnp.zeros_like(qb), jnp.zeros_like(bb))

    chain.defvjp(fwd, bwd)
    return chain
