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


def resolve_spp_chunk(cfg: RenderConfig,
                      spp_chunk: int | None = None,
                      scene: SceneArrays | None = None) -> int:
    """The chunked trainer's effective samples-per-chunk: the requested
    value (or the auto heuristic — see make_train_step_chunked's inline
    comment), clamped to the scene's HBM-safe cap and reduced to the
    largest divisor of cfg.spp so chunks tile the sample range exactly.
    Exposed so harnesses can report the chunk a run ACTUALLY used
    (benchmarks/north_star.py).

    The cap is scene-dependent because the backward's segment length
    is (megakernel_train._seg_cfg): a lean spill layout gets K=192
    above 256 spp, halving the boundary residual, so a 500-spp chunk
    parks the same ~13 GB a 250-spp chunk needs at K=96 — and a
    single-chunk step has NO spill-forward re-renders at all. Heavier
    layouts stay at K<=96, where a >256-spp chunk's residual would
    blow the 16 GB HBM, so their cap is 256 (explicit requests above
    it are clamped). Without a scene the conservative 256 cap
    applies."""
    from .ops.megakernel_train import lean_spill
    from .render import DIFF_SAMPLE_BUDGET
    lean = scene is not None and lean_spill(
        scene.has_quads, scene.has_boxes, scene.has_images,
        scene.n_media_active)
    cap = 512 if lean else 256
    if spp_chunk:
        chunk = min(spp_chunk, cap)
    elif lean and cfg.spp <= cap:
        chunk = cfg.spp  # single chunk: zero re-renders
    else:
        chunk = min(cap, max(DIFF_SAMPLE_BUDGET, cfg.spp // 2))
    if cfg.spp % chunk != 0:
        chunk = next(c for c in range(chunk, 0, -1) if cfg.spp % c == 0)
    return chunk


def make_train_step_chunked(cfg: RenderConfig, lr: float = 1e-2,
                            spp_chunk: int | None = None):
    """Full-spp MSE training step executed as MULTIPLE device calls —
    the north-star 1200x800x500spp config end to end.

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
    from .render import trace_tiles, trace_tiles_diff

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

        @jax.jit
        def fwd_chunk(scene, camera, seed, lo):
            return trace_tiles(scene, camera, cfg, seed, sample_lo=lo,
                               n_samples=chunk)

        @jax.jit
        def bwd_chunk(scene, params, camera, seed, lo, cot):
            def rad_of(p, c):
                # sample_budget=chunk: this call IS the chunking — one
                # custom_vjp chain per backward call, no inner remat
                # split (each split sub-chunk would re-run a
                # spill-forward).
                rad, _ = trace_tiles_diff(combine(scene, p), c, cfg,
                                          seed, sample_lo=lo,
                                          n_samples=chunk,
                                          sample_budget=chunk)
                return rad
            _, vjp = jax.vjp(rad_of, params, camera)
            return vjp(cot)

        chunk_fns[chunk] = (fwd_chunk, bwd_chunk)
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
                fallback.append(_make_train_step_oneshot(cfg, None, lr))
            return fallback[0](scene, camera, target, seed)
        seed = jnp.asarray(seed)
        params = partition(scene)
        chunk = resolve_spp_chunk(cfg, spp_chunk, scene)
        fwd_chunk, bwd_chunk = get_chunk_fns(chunk)
        # Chunk 0 runs its forward through an (eager) jax.vjp so its
        # spill residuals survive until the cotangent exists: its
        # backward then needs NO re-render. Only one chunk can do this
        # — the residual (segment-boundary buffer) scales with
        # chunk spp / K, so holding every chunk's would blow HBM;
        # holding exactly one parks ~13 GB temporarily, and on lean
        # scenes where the chunk IS the full budget (K=192 tier) the
        # whole step has zero re-renders.
        from .render import trace_tiles_diff as _ttd

        def rad_of0(p, c):
            rad, _ = _ttd(combine(scene, p), c, cfg, seed,
                          sample_lo=0, n_samples=chunk,
                          sample_budget=chunk)
            return rad
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

    Single-device sample budgets beyond 256 spp route through
    make_train_step_chunked automatically (same update, multiple device
    calls): one jit call holding every chunk's fwd+bwd graph exceeds
    this runtime's ~60 s execution window (BASELINE.md "North-star
    training"). Out-of-scope scenes/backends fall back to the one-shot
    scan-path step at call time. Sharded steps split spp over "sp"
    first, so their per-rank budget is usually already inside the
    window.

    Returns step(scene, camera, target, seed) ->
        (scene', camera', loss).
    """
    from .render import DIFF_SAMPLE_BUDGET
    if mesh is None and cfg.spp > 4 * DIFF_SAMPLE_BUDGET:
        return make_train_step_chunked(cfg, lr=lr)
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
