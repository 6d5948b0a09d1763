"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4
item 4): shard-vs-single equivalence, mesh-factorization invariance, and
the full sharded training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrt_tpu
from rrt_tpu.diff import make_train_step
from rrt_tpu.parallel.mesh import make_mesh, render_image_sharded
from rrt_tpu.scenes import chap11_scene, diffuse_scene

CFG = rrt_tpu.RenderConfig(width=64, height=36, spp=16, max_depth=8,
                           tile_pixels=576, samples_per_pass=2)


def test_sharded_matches_single_device():
    scene, cam = diffuse_scene(CFG.width, CFG.height)
    img1, n1 = rrt_tpu.render_image(scene, cam, CFG, 0)
    mesh = make_mesh(dp=4, sp=2)
    img2, n2 = render_image_sharded(scene, cam, CFG, 0, mesh)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               atol=1e-5, rtol=1e-5)
    assert int(n1) == int(n2)


def test_mesh_factorization_invariance():
    """Tile/pass keys are global ids, so any dp x sp factorization of the
    same device count produces the same image (up to psum ordering)."""
    scene, cam = diffuse_scene(CFG.width, CFG.height)
    imgs = []
    for dp, sp in ((8, 1), (4, 2), (2, 4), (1, 8)):
        img, _ = render_image_sharded(scene, cam, CFG, 0,
                                      make_mesh(dp=dp, sp=sp))
        imgs.append(np.asarray(img))
    for other in imgs[1:]:
        np.testing.assert_allclose(imgs[0], other, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_sharded_train_step_runs_and_descends():
    mesh = make_mesh(dp=4, sp=2)
    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=4, max_depth=4,
                               tile_pixels=16, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    step = make_train_step(cfg, mesh=mesh, lr=1e-3)
    s, c, loss0 = step(scene, cam, target, 0)
    assert np.isfinite(float(loss0))
    # One step toward a black target must reduce the same-seed loss.
    _, _, loss1 = step(s, c, target, 0)
    assert float(loss1) < float(loss0)


@pytest.mark.slow
def test_gradients_replicated_across_mesh():
    """Parameter grads must come back identical to unsharded grads (the
    implicit psum of the shard_map transpose)."""
    from rrt_tpu.diff import partition, render_loss
    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=4, max_depth=3,
                               tile_pixels=16, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params = partition(scene)

    g_single = jax.grad(render_loss)(params, cam, scene, target, cfg, 0,
                                     None)
    mesh = make_mesh(devices=jax.devices()[:4], dp=2, sp=2)
    g_shard = jax.grad(render_loss)(params, cam, scene, target, cfg, 0,
                                    mesh)
    for k in g_single:
        np.testing.assert_allclose(np.asarray(g_single[k]),
                                   np.asarray(g_shard[k]), atol=1e-5,
                                   rtol=1e-4, err_msg=k)


def test_sharded_queue_matches_single():
    """The fast (queue) driver sharded over dp x sp must reproduce the
    single-device queue image (global per-sample keys)."""
    from rrt_tpu.parallel.mesh import render_image_queue_sharded
    from rrt_tpu.render import render_image_queue
    cfg = rrt_tpu.RenderConfig(width=48, height=27, spp=8, max_depth=8,
                               queue_size=2048)
    scene, cam = diffuse_scene(cfg.width, cfg.height)
    img1, n1 = render_image_queue(scene, cam, cfg, 0)
    for dp, sp in ((8, 1), (4, 2), (2, 4)):
        img2, n2 = render_image_queue_sharded(scene, cam, cfg, 0,
                                              make_mesh(dp=dp, sp=sp))
        np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                                   atol=1e-5, rtol=1e-5)
        assert int(n1) == int(n2)


@pytest.mark.slow
def test_fused_train_sharded_matches_single(monkeypatch):
    """The sharded fused tile train path (VERDICT r2 missing #1):
    virtual-8-mesh scene+camera gradients through
    trace_tiles_diff_sharded must match the single-device fused path
    (trace_tiles_diff) — same kernels, same (pixel, sample)-global
    keys; only f32 psum/summation order differs. Runs the Pallas
    kernels in interpret mode via RRT_INTERPRET."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    from rrt_tpu.diff import combine, partition
    from rrt_tpu.parallel.mesh import trace_tiles_diff_sharded
    from rrt_tpu.render import trace_tiles_diff

    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=4, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    params = partition(scene)

    def loss_single(p, c):
        rad, _ = trace_tiles_diff(combine(scene, p), c, cfg, 0)
        return jnp.mean(rad * rad)

    mesh = make_mesh(dp=4, sp=2)

    def loss_sharded(p, c):
        rad, _ = trace_tiles_diff_sharded(combine(scene, p), c, cfg, 0,
                                          mesh)
        return jnp.mean(rad * rad)

    l1, (gp1, gc1) = jax.value_and_grad(loss_single, argnums=(0, 1))(
        params, cam)
    l2, (gp2, gc2) = jax.value_and_grad(loss_sharded, argnums=(0, 1))(
        params, cam)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves((gp1, gc1))
    flat2 = jax.tree_util.tree_leaves((gp2, gc2))
    total = 0.0
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
        total += float(jnp.sum(jnp.abs(a)))
    assert total > 0.0  # gradients actually flowed


@pytest.mark.slow
def test_fused_train_sharded_factorization_invariance(monkeypatch):
    """Any dp x sp factorization produces the same fused-path gradients
    (global sample keys; psum-order differences only)."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    from rrt_tpu.diff import combine, partition
    from rrt_tpu.parallel.mesh import trace_tiles_diff_sharded

    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=4, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    params = partition(scene)

    grads = []
    for dp, sp in ((8, 1), (2, 4)):
        mesh = make_mesh(dp=dp, sp=sp)

        def loss(p):
            rad, _ = trace_tiles_diff_sharded(combine(scene, p), cam,
                                              cfg, 0, mesh)
            return jnp.mean(rad * rad)

        grads.append(jax.grad(loss)(params))
    for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                    jax.tree_util.tree_leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_train_sharded_sample_chunking(monkeypatch):
    """The sharded fused train path chunks each rank's sample range at
    DIFF_SAMPLE_BUDGET; forcing a tiny budget must reproduce the
    unchunked sharded gradients exactly (same keys; f32 order only)."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    import rrt_tpu.render as rrender
    from rrt_tpu.diff import combine, partition
    from rrt_tpu.parallel.mesh import trace_tiles_diff_sharded

    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=4, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    params = partition(scene)
    mesh = make_mesh(dp=4, sp=2)

    def loss(p):
        rad, _ = trace_tiles_diff_sharded(combine(scene, p), cam, cfg,
                                          0, mesh)
        return jnp.mean(rad * rad)

    l_ref, g_ref = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(rrender, "DIFF_SAMPLE_BUDGET", 1)
    l_ch, g_ch = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l_ref), float(l_ch), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ch)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_check_vma_policy(monkeypatch):
    """Round 5 flipped shard_map's static varying-manual-axes verifier
    ON for real execution (VERDICT r2 weak #6 watch-list item): the
    shared drivers cast their loop-carry inits varying
    (rrt_tpu.utils.vma.vary_for_mesh) and Pallas out_shapes declare
    their vma (ops.megakernel.pallas_call), so the pure-XLA sharded
    paths typecheck — exercised implicitly by every non-interpret
    sharded test in this file, and explicitly here. The one remaining
    False is RRT_INTERPRET=1 (mesh._vma_check): interpret mode inlines
    the Pallas kernels, leaking in-kernel loop carries (lane-iota ray
    regeneration, invariant by construction) into the verifier. This
    test pins BOTH halves; when the interpret half stops raising,
    remove _vma_check and pass True unconditionally."""
    import importlib

    import rrt_tpu.parallel.mesh as mesh_mod

    monkeypatch.delenv("RRT_INTERPRET", raising=False)
    assert mesh_mod._vma_check() is True
    scene, cam = diffuse_scene(CFG.width, CFG.height)
    mesh = mesh_mod.make_mesh(dp=4, sp=2)
    # the verifier is ON and the queue path passes it
    img, n = mesh_mod.render_image_queue_sharded(scene, cam, CFG, 0,
                                                 mesh)
    assert float(n) > 0

    # interpret mode: verifier off, and for a pinned reason — forcing
    # it on makes the inlined tile kernel's carry types mismatch.
    monkeypatch.setenv("RRT_INTERPRET", "1")
    assert mesh_mod._vma_check() is False
    calls = {}
    orig = jax.shard_map

    def forced(f, **kw):
        kw["check_vma"] = True
        calls["n"] = calls.get("n", 0) + 1
        return orig(f, **kw)

    monkeypatch.setattr(jax, "shard_map", forced)
    importlib.reload(mesh_mod)
    try:
        from rrt_tpu.scenes import chap11_scene
        cfg2 = rrt_tpu.RenderConfig(width=16, height=8, spp=4,
                                    max_depth=3)
        sc2, cm2 = chap11_scene(16, 8)
        with pytest.raises(Exception, match="varying manual axes"):
            mesh_mod.render_image_tiles_sharded(sc2, cm2, cfg2, 0, mesh)
        assert calls.get("n", 0) >= 1
    finally:
        monkeypatch.undo()
        importlib.reload(mesh_mod)


def test_sharded_tiles_distribute_across_ranks(monkeypatch):
    """Tile-heavy scenes default to one-instance packing (up to 128
    chains) on a single device; on a mesh the sharded renderers must
    cap chains so every dp-rank gets REAL pixel blocks, not padding.
    Renders rttnw_final tiny on the virtual mesh (interpret kernels)
    and checks it still matches the single-device tile render."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    from rrt_tpu.parallel.mesh import render_image_tiles_sharded
    from rrt_tpu.render import render_image_tiles, tile_chains
    from rrt_tpu.scenes import rttnw_final_scene

    cfg = rrt_tpu.RenderConfig(width=48, height=27, spp=2, max_depth=3)
    scene, cam = rttnw_final_scene(cfg.width, cfg.height)
    # the single-device default would pack everything into <= 2 blocks
    from rrt_tpu.ops import megakernel as mk
    n_pix = cfg.width * cfg.height
    single = tile_chains(cfg, scene)
    assert -(-n_pix // (single * mk.TN)) < 8  # would starve dp=8
    mesh = make_mesh(dp=8, sp=1)
    img_s, n_s = render_image_tiles_sharded(scene, cam, cfg, 0, mesh)
    img_1, n_1 = render_image_tiles(scene, cam, cfg, 0)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_chunked_sharded_train_matches_single_device(monkeypatch):
    """VERDICT r4 next #3: `make_train_step` under a mesh must CHUNK
    big per-rank sample budgets (multiple sharded device calls) instead
    of putting the whole spp range into one shard_map call — the
    single-device route has chunked since round 3, the mesh route never
    did, which on real hardware would drive a 500-spp sp=1 step into
    the ~60 s execution wall. Scaled-down north-star shape: the sharded
    chunked step's loss and updated parameters must match the
    single-device chunked step (same global (pixel, sample) keys; f32
    summation order only)."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    from rrt_tpu.diff import make_train_step_chunked, partition

    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=16, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    step_1 = make_train_step_chunked(cfg, spp_chunk=4)
    s1, c1, l1 = step_1(scene, cam, target, 0)

    mesh = make_mesh(dp=4, sp=2)
    step_m = make_train_step_chunked(cfg, spp_chunk=4, mesh=mesh)
    sm, cm, lm = step_m(scene, cam, target, 0)

    np.testing.assert_allclose(float(l1), float(lm), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((partition(s1), c1)),
                    jax.tree_util.tree_leaves((partition(sm), cm))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_make_train_step_mesh_routes_to_chunked(monkeypatch):
    """The router must send big PER-RANK budgets (spp/sp beyond
    4*DIFF_SAMPLE_BUDGET) through the chunked-sharded trainer, and the
    resulting step must still descend on the virtual mesh."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    import rrt_tpu.render as rrender
    monkeypatch.setattr(rrender, "DIFF_SAMPLE_BUDGET", 1)

    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=16, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32) + 0.5
    mesh = make_mesh(dp=4, sp=2)
    # per-rank spp/sp=8 > 4*DIFF_SAMPLE_BUDGET*1 -> chunked-sharded.
    step = make_train_step(cfg, mesh=mesh)
    assert not hasattr(step, "lower")  # chunked: plain fn, not one jit
    s2, c2, loss0 = step(scene, cam, target, 0)
    _, _, loss1 = step(s2, c2, target, 0)
    assert float(loss1) < float(loss0)


def test_trace_tiles_sharded_sample_range(monkeypatch):
    """trace_tiles_sharded with [sample_lo, sample_lo+n) must tile the
    sample space exactly like the single-device trace_tiles chunks the
    chunked trainer uses (global (pixel, sample)-addressed keys)."""
    monkeypatch.setenv("RRT_INTERPRET", "1")
    from rrt_tpu.parallel.mesh import trace_tiles_sharded
    from rrt_tpu.render import trace_tiles

    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=8, max_depth=3)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    mesh = make_mesh(dp=2, sp=4)
    r_s, n_s = trace_tiles_sharded(scene, cam, cfg, 0, mesh,
                                   sample_lo=4, n_samples=4)
    r_1, n_1 = trace_tiles(scene, cam, cfg, 0, sample_lo=4, n_samples=4)
    assert float(n_s) == float(n_1)
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_1),
                               atol=2e-5, rtol=1e-4)


def test_vary_for_mesh_noop_outside_shard_map():
    """vary_for_mesh must be IDENTITY outside a shard_map — no pcast in
    single-device jaxprs (cache keys and lowering unchanged), leaves
    returned as-is eagerly."""
    import jax.numpy as jnp

    from rrt_tpu.utils.vma import manual_axis_names, vary_for_mesh

    assert manual_axis_names() == ()
    x = (jnp.ones((4,)), jnp.zeros((), jnp.int32))
    y = vary_for_mesh(x)
    assert y[0] is x[0] and y[1] is x[1]

    from rrt_tpu.render import RenderConfig, trace_tiles  # noqa: F401
    from rrt_tpu import rng
    from rrt_tpu.camera import generate_rays
    from rrt_tpu.render import trace_batch
    from rrt_tpu.scenes import diffuse_scene

    scene, cam = diffuse_scene(8, 4)
    ids = jnp.arange(32, dtype=jnp.int32)
    px, py = ids % 8, ids // 8
    keys = rng.sample_keys(jax.random.key(0),
                           (py * 8 + px).astype(jnp.uint32), 0)
    o, d, tm = generate_rays(cam, px, py, 8, 4, keys)
    jaxpr = jax.make_jaxpr(
        lambda: trace_batch(scene, o, d, tm, keys, 2, 1e-3,
                            differentiable=False))()
    assert "pcast" not in str(jaxpr) and "pvary" not in str(jaxpr)


def test_chunked_trainer_mesh_fallback_uses_sharded_oneshot(monkeypatch,
                                                            caplog):
    """A chunked-sharded trainer whose scene/backend falls out of the
    fused kernel scope must fall back to the ONE-SHOT step with the
    SAME mesh (round 5 — previously the fallback silently dropped the
    mesh), warning with the reason. On the CPU backend without
    RRT_INTERPRET the Pallas gate trips naturally."""
    import logging

    import rrt_tpu.render as rrender
    from rrt_tpu.diff import make_train_step_chunked

    monkeypatch.delenv("RRT_INTERPRET", raising=False)
    monkeypatch.setattr(rrender, "_warned_fallbacks", set())
    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=4, max_depth=3,
                               tile_pixels=32, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32) + 0.3
    mesh = make_mesh(dp=4, sp=2)
    step = make_train_step_chunked(cfg, spp_chunk=2, mesh=mesh)
    with caplog.at_level(logging.WARNING, logger="rrt_tpu.render"):
        s2, c2, l0 = step(scene, cam, target, 0)
    assert any("make_train_step_chunked" in r.message
               for r in caplog.records)
    _, _, l1 = step(s2, c2, target, 0)
    assert float(l1) < float(l0)
    # and the sharded one-shot result equals the meshless one (same
    # keys; the mesh only changes the execution layout)
    from rrt_tpu.diff import _make_train_step_oneshot
    s_ref, c_ref, l_ref = _make_train_step_oneshot(cfg, None, 1e-2)(
        scene, cam, target, 0)
    np.testing.assert_allclose(float(l0), float(l_ref), rtol=1e-5)
