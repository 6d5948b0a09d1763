"""Differentiable rendering: parameter partitioning + training step.

The north star requires pixel gradients w.r.t. geometry (centers, radii),
materials (albedo/fuzz/ior) and camera parameters. The wavefront loop is
reverse-differentiable by construction (scan + per-bounce checkpoint in
render.trace_batch); this module handles the bookkeeping:

  * `partition` extracts the float leaves of SceneArrays as a grad-able
    params dict (integer id/valid tables stay frozen);
  * `make_train_step` builds a jitted fwd+bwd step: render -> scalar loss
    -> grads -> SGD update, optionally sharded over a ("dp","sp") mesh, in
    which case parameter gradients are implicitly all-reduced by the
    shard_map transpose of the replicated in_specs (the "grad psum
    overlapped with replay" of SURVEY.md §2.2).

Discrete sampling decisions (argmin winners, dielectric branch, material
masks) are integer/boolean selects, so sampling is detached exactly as
path-replay backprop prescribes: gradients flow only through continuous
quantities.
"""

import dataclasses
import logging

import jax
import jax.numpy as jnp

from .camera import Camera
from .parallel.mesh import render_image_diff_sharded
from .render import RenderConfig, render_image, render_image_diff
from .scene import SceneArrays

# Scene leaves that make sense to optimize (continuous scene parameters).
DIFFERENTIABLE_FIELDS = (
    "sphere_c0", "sphere_dc", "sphere_radius",
    "quad_q", "quad_u", "quad_v",
    "box_center", "box_half",
    "med_center", "med_radius", "med_half", "med_neg_inv_density",
    "mat_fuzz", "mat_ior",
    "tex_color1", "tex_color2", "tex_scale",
    "bg_bottom", "bg_top",
)


def partition(scene: SceneArrays) -> dict:
    """Extract optimizable float leaves."""
    return {f: getattr(scene, f) for f in DIFFERENTIABLE_FIELDS}


def combine(scene: SceneArrays, params: dict) -> SceneArrays:
    return dataclasses.replace(scene, **params)


def render_loss(params: dict, camera: Camera, scene: SceneArrays,
                target, cfg: RenderConfig, seed, mesh=None):
    """MSE between a differentiable render and a target image."""
    s = combine(scene, params)
    if mesh is None:
        img, _ = render_image_diff(s, camera, cfg, seed)
    else:
        # Sharded fused tile train path when in kernel scope (one
        # spill-forward + one replay-adjoint launch per dp-shard, grads
        # all-reduced by the shard_map transpose); XLA scan otherwise.
        img, _ = render_image_diff_sharded(s, camera, cfg, seed, mesh)
    return jnp.mean((img - target) ** 2)


def _residual_budget_bytes() -> int:
    """HBM allowance for one train launch's segment-boundary buffer
    (parked across the cotangent barrier by the chunked trainer's chunk
    0 and resident during every backward call). Default 13 GB: the
    north-star 1200x800x500spp single-chunk step parks a measured
    12.5 GB and runs reliably on the 16 GB v5e (BASELINE.md). Raise or
    lower via RRT_RESIDUAL_BUDGET_GB for parts with different HBM."""
    import os
    return int(float(os.environ.get("RRT_RESIDUAL_BUDGET_GB", "13"))
               * 1e9)


def resolve_spp_chunk(cfg: RenderConfig,
                      spp_chunk: int | None = None,
                      scene: SceneArrays | None = None,
                      sp: int = 1, dp: int = 1) -> int:
    """The chunked trainer's effective samples-per-chunk: the requested
    value (or the auto heuristic — see make_train_step_chunked's inline
    comment), clamped so every device call fits HBM, reduced to the
    largest divisor of cfg.spp (so chunks tile the sample range
    exactly) that is a multiple of sp (so each chunk splits evenly over
    the mesh's sample axis). Exposed so harnesses can report the chunk
    a run ACTUALLY used (benchmarks/north_star.py).

    Two HBM gates, both per PER-RANK quantities (chunk/sp samples,
    ~n_pix/dp pixels):

      * the K-tier cap (megakernel_train.LEAN_CHUNK_CAP /
        HEAVY_CHUNK_CAP, defined next to _seg_cfg's tier gate so the
        thresholds cannot drift — ADVICE r4 #1): a lean spill layout
        gets K=192 above 256 spp, halving the boundary residual, so a
        500-spp chunk parks the same ~13 GB a 250-spp chunk needs at
        K=96 — and a single-chunk step has NO spill-forward re-renders
        at all. Heavier layouts stay at K<=96, capping at 256.
      * the resolution-aware residual budget (VERDICT r4 next #4): the
        K tiers hold residual-per-chunk roughly constant in CHUNK, so
        the parked bytes scale with IMAGE SIZE
        (megakernel_train.boundary_residual_bytes) — 12.5 GB at
        1200x800 but ~27 GB at 1920x1080 for any chunk >= 128. The
        chunk is reduced until the predicted bytes fit
        _residual_budget_bytes(), so no config can auto-select an
        OOM plan (a lean 1920x1080@500spp resolves 50-spp chunks).

    Without a scene the conservative 256 cap applies and the residual
    check is skipped (no spill layout to predict with)."""
    from .ops.megakernel_train import (HEAVY_CHUNK_CAP, LEAN_CHUNK_CAP,
                                       boundary_residual_bytes,
                                       lean_spill)
    from .render import DIFF_SAMPLE_BUDGET, tile_chains_diff
    lean = scene is not None and lean_spill(
        scene.has_quads, scene.has_boxes, scene.has_images,
        scene.n_media_active)
    cap = (LEAN_CHUNK_CAP if lean else HEAVY_CHUNK_CAP) * sp
    if spp_chunk:
        chunk = min(spp_chunk, cap)
    elif lean and cfg.spp <= cap:
        chunk = cfg.spp  # single chunk: zero re-renders
    else:
        chunk = min(cap, max(DIFF_SAMPLE_BUDGET * sp, cfg.spp // 2))

    budget = _residual_budget_bytes()
    n_pix_local = -(-cfg.width * cfg.height // dp)

    def admissible(c):
        if cfg.spp % c != 0 or c % sp != 0:
            return False
        if scene is None:
            return True
        c_local = c // sp
        flags = dict(has_quads=scene.has_quads,
                     has_boxes=scene.has_boxes,
                     has_images=scene.has_images,
                     n_media=scene.n_media_active)
        return boundary_residual_bytes(
            n_pix_local, c_local, tile_chains_diff(cfg, c_local),
            cfg.max_depth, flags) <= budget

    eff = next((c for c in range(chunk, 0, -1) if admissible(c)), None)
    if eff is None:
        # Name the gate that actually rejected every candidate: a
        # divisor/sp failure and a residual-budget failure need
        # opposite remedies (change spp/sp vs raise
        # RRT_RESIDUAL_BUDGET_GB / shrink the image).
        shape_ok = [c for c in range(chunk, 0, -1)
                    if cfg.spp % c == 0 and c % sp == 0]
        if not shape_ok:
            raise ValueError(
                f"no admissible spp chunk: cfg.spp={cfg.spp} must have "
                f"a divisor that is a multiple of sp={sp}")
        raise ValueError(
            f"no admissible spp chunk: every candidate down to "
            f"{shape_ok[-1]} parks a boundary residual above the "
            f"{budget / 1e9:.1f} GB budget at {cfg.width}x{cfg.height}"
            f"/dp={dp} (RRT_RESIDUAL_BUDGET_GB raises it)")
    if spp_chunk and eff != spp_chunk:
        _warn_chunk_adjusted(spp_chunk, eff, cap, budget)
    return eff


_warned_chunks: set = set()


def _warn_chunk_adjusted(requested: int, effective: int, cap: int,
                         budget: int):
    """One warning per (requested, effective) pair per process — a user
    asking for chunk=400 on a 500-spp non-lean run silently got 250
    before (ADVICE r4 #2); the adjustment is correct but deserves a
    signal outside benchmark printouts."""
    key = (requested, effective)
    if key not in _warned_chunks:
        _warned_chunks.add(key)
        logging.getLogger("rrt_tpu.diff").warning(
            "requested spp_chunk=%d adjusted to %d (HBM-safe cap %d, "
            "boundary-residual budget %.1f GB, and the chunk must "
            "divide cfg.spp and split evenly over the mesh's sample "
            "axis)", requested, effective, cap, budget / 1e9)


def make_train_step_chunked(cfg: RenderConfig, lr: float = 1e-2,
                            spp_chunk: int | None = None, mesh=None):
    """Full-spp MSE training step executed as MULTIPLE device calls —
    the north-star 1200x800x500spp config end to end, single-device or
    sharded over a ("dp","sp") mesh (VERDICT r4 next #3: a sharded
    big-spp step must ALSO chunk — with sp=1 a 500-spp north-star step
    would otherwise put ~45+ s of fwd+bwd into one shard_map call,
    straight into the ~60 s execution wall).

    One jitted call containing every sample chunk exceeds this
    runtime's single-execution window (~60 s: 4x64spp chunk graphs run
    in 41.6 s, 6 fault — BASELINE.md), and without remat a nonlinear
    loss would keep every chunk's segment-boundary residual alive at
    once. This step exploits the image's LINEARITY in per-chunk
    radiance instead:

      pass 1  chunk 0 through an eager jax.vjp (its spill residuals
              park across the cotangent barrier) + plain forward
              chunks (trace_tiles, fast kernel) for the rest -> image;
      pass 2  loss + d(loss)/d(image) (tiny jit);
      pass 3  chunk 0's backward reuses the parked residuals (no
              re-render); every other chunk runs ONE spill-forward +
              ONE replay-adjoint launch via jax.vjp seeded with the
              image cotangent; gradients accumulate on host refs.

    On lean scenes the chunk IS the full budget up to 512 spp
    (resolve_spp_chunk's K=192 tier), so "the rest" is empty and the
    step has zero re-renders.

    Numerically identical to make_train_step's one-shot gradient (same
    (pixel, sample)-global keys; f32 accumulation order differs), with
    HBM bounded at one chunk's residual and every device call well
    inside the execution window.

    Returns step(scene, camera, target, seed) ->
        (scene', camera', loss)."""
    from .parallel.mesh import trace_tiles_diff_sharded, trace_tiles_sharded
    from .render import trace_tiles, trace_tiles_diff

    sp = mesh.shape["sp"] if mesh is not None else 1
    dp = mesh.shape["dp"] if mesh is not None else 1

    # Auto chunk (resolve_spp_chunk, scene-aware so it resolves inside
    # step): bigger chunks amortize per-call dispatch AND avoid
    # spill-forward re-renders: the 500spp north star measured 77.0 s
    # at chunk=64, 76.1 at 100, 73.5 at 125 with the remat split,
    # 67.5 s at 125 as one chain per backward call, 62.5 s at 250
    # (K=96 tier), and a lean-scene SINGLE 500-spp chunk (K=192 tier)
    # re-renders nothing (BASELINE.md "North-star training", round 4).
    # cfg (including rr_depth) is shared by the forward chunks and the
    # backward replays: the cotangent must be evaluated at the image
    # gradients flow through, and since round 4 the differentiable
    # paths honor rr (replayed kill + detached 1/p weight) with
    # trace_tiles' in-kernel RR draw-identical to the train kernel's.
    n_pix = cfg.width * cfg.height

    @jax.jit
    def loss_and_cot(rad_sum, target):
        def loss_of(rs):
            img = rs.reshape(cfg.height, cfg.width, 3) / jnp.float32(
                cfg.spp)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss_of)(rad_sum)

    @jax.jit
    def apply_sgd(scene_params, camera, gp, gc):
        new_p = jax.tree.map(lambda p, g: p - lr * g, scene_params, gp)
        new_c = jax.tree.map(lambda p, g: p - lr * g, camera, gc)
        return new_p, new_c

    # Per-chunk-size jitted closures, built lazily: the chunk size is
    # scene-dependent (resolve_spp_chunk's lean gate), and the scene
    # first appears at step() time.
    chunk_fns = {}

    def get_chunk_fns(chunk):
        if chunk in chunk_fns:
            return chunk_fns[chunk]

        if mesh is None:
            @jax.jit
            def fwd_chunk(scene, camera, seed, lo):
                return trace_tiles(scene, camera, cfg, seed,
                                   sample_lo=lo, n_samples=chunk)

            def rad_fn(s, c, seed, lo):
                # sample_budget=chunk: this call IS the chunking — one
                # custom_vjp chain per backward call, no inner remat
                # split (each split sub-chunk would re-run a
                # spill-forward).
                rad, _ = trace_tiles_diff(s, c, cfg, seed,
                                          sample_lo=lo, n_samples=chunk,
                                          sample_budget=chunk)
                return rad
        else:
            @jax.jit
            def fwd_chunk(scene, camera, seed, lo):
                return trace_tiles_sharded(scene, camera, cfg, seed,
                                           mesh, sample_lo=lo,
                                           n_samples=chunk)

            def rad_fn(s, c, seed, lo):
                # Per-rank sample budget chunk/sp: ONE custom_vjp chain
                # per rank per backward call (no inner remat split),
                # gradients all-reduced by the shard_map transpose.
                rad, _ = trace_tiles_diff_sharded(
                    s, c, cfg, seed, mesh, sample_lo=lo,
                    n_samples=chunk, sample_budget=chunk // sp)
                return rad

        @jax.jit
        def bwd_chunk(scene, params, camera, seed, lo, cot):
            def rad_of(p, c):
                return rad_fn(combine(scene, p), c, seed, lo)
            _, vjp = jax.vjp(rad_of, params, camera)
            return vjp(cot)

        chunk_fns[chunk] = (fwd_chunk, bwd_chunk, rad_fn)
        return chunk_fns[chunk]

    fallback = []

    def step(scene: SceneArrays, camera: Camera, target, seed):
        # Scene/backend gate happens HERE (the scene isn't known at
        # build time): out-of-kernel-scope scenes and non-Pallas
        # backends keep the one-shot scan-path step the spp<=256 route
        # still has, instead of crashing in trace_tiles — with one
        # warning naming why (VERDICT r3 weak #7).
        from .render import _warn_diff_fallback, diff_fallback_reason
        reason = diff_fallback_reason(scene, cfg)
        if reason is not None:
            _warn_diff_fallback("make_train_step_chunked", reason)
            if not fallback:
                fallback.append(_make_train_step_oneshot(cfg, mesh, lr))
            return fallback[0](scene, camera, target, seed)
        seed = jnp.asarray(seed)
        params = partition(scene)
        chunk = resolve_spp_chunk(cfg, spp_chunk, scene, sp=sp, dp=dp)
        fwd_chunk, bwd_chunk, rad_fn = get_chunk_fns(chunk)
        # Chunk 0 runs its forward through an (eager) jax.vjp so its
        # spill residuals survive until the cotangent exists: its
        # backward then needs NO re-render. Only one chunk can do this
        # — the residual (segment-boundary buffer) scales with
        # chunk spp / K, so holding every chunk's would blow HBM;
        # holding exactly one parks ~13 GB temporarily, and on lean
        # scenes where the chunk IS the full budget (K=192 tier) the
        # whole step has zero re-renders.

        def rad_of0(p, c):
            return rad_fn(combine(scene, p), c, seed, 0)
        rad0, vjp0 = jax.vjp(rad_of0, params, camera)
        rad_sum = rad0
        for lo in range(chunk, cfg.spp, chunk):
            r, _ = fwd_chunk(scene, camera, seed, lo)
            rad_sum = rad_sum + r
        loss, cot = loss_and_cot(rad_sum, target)
        gp, gc = vjp0(cot)
        del vjp0, rad0  # free chunk 0's residual before the next vjp
        for lo in range(chunk, cfg.spp, chunk):
            dgp, dgc = bwd_chunk(scene, params, camera, seed, lo, cot)
            gp = jax.tree.map(jnp.add, gp, dgp)
            gc = jax.tree.map(jnp.add, gc, dgc)
        new_params, new_camera = apply_sgd(params, camera, gp, gc)
        return combine(scene, new_params), new_camera, loss

    return step


def make_train_step(cfg: RenderConfig, mesh=None, lr: float = 1e-2):
    """Jitted full training step: fwd render + bwd replay + SGD update.

    Sample budgets beyond 256 spp PER RANK (spp/sp on a mesh) route
    through make_train_step_chunked automatically (same update,
    multiple device calls, sharded per chunk when a mesh is given): one
    device call holding every chunk's fwd+bwd graph exceeds this
    runtime's ~60 s execution window (BASELINE.md "North-star
    training") — and before round 5 the mesh route never chunked, so an
    sp=1 sharded north-star step would have faulted there (VERDICT r4
    next #3). Out-of-scope scenes/backends fall back to the one-shot
    scan-path step at call time.

    Returns step(scene, camera, target, seed) ->
        (scene', camera', loss).
    """
    from .render import DIFF_SAMPLE_BUDGET
    sp = mesh.shape["sp"] if mesh is not None else 1
    if cfg.spp > 4 * DIFF_SAMPLE_BUDGET * sp:
        return make_train_step_chunked(cfg, lr=lr, mesh=mesh)
    return _make_train_step_oneshot(cfg, mesh, lr)


def _make_train_step_oneshot(cfg: RenderConfig, mesh, lr: float):

    def step(scene: SceneArrays, camera: Camera, target, seed):
        params = partition(scene)
        loss, (gp, gc) = jax.value_and_grad(render_loss,
                                            argnums=(0, 1))(
            params, camera, scene, target, cfg, seed, mesh)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, gp)
        new_camera = jax.tree.map(lambda p, g: p - lr * g, camera, gc)
        return combine(scene, new_params), new_camera, loss

    return jax.jit(step)
