"""Sanitizer-class checks (SURVEY.md §5.2).

The reference NEEDS a race detector for its UnsafeCell thread-local RNG
(src/threadpool.rs:6, src/lib.rs:90-92) but ships none; the rebuild's
stateless counter-keyed design removes that hazard class by
construction. What remains checkable here:

  * NaN hygiene — jax_debug_nans raises on any NaN materialized by a
    render (the kernels use INF sentinels and clamped math; a NaN
    anywhere is a bug);
  * buffer aliasing/donation — no entry point may mutate its inputs
    (nothing is donated; a clobbered scene would silently corrupt the
    next chunk of a progressive render);
  * tracer leaks — jit boundaries must not capture tracers (the
    existing check in test_queue covers the queue driver; this covers
    the train step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrt_tpu
from rrt_tpu.diff import make_train_step
from rrt_tpu.scenes import chap11_scene, cornell_box_scene


def test_render_is_nan_free():
    cfg = rrt_tpu.RenderConfig(width=24, height=16, spp=2, max_depth=4,
                               tile_pixels=96, samples_per_pass=2)
    scene, cam = cornell_box_scene(cfg.width, cfg.height)
    jax.config.update("jax_debug_nans", True)
    try:
        img, n = rrt_tpu.render_image(scene, cam, cfg, 0)
        jax.block_until_ready(img)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(np.asarray(img)).all()


def test_entry_points_do_not_mutate_inputs():
    """No donation/aliasing: scene and camera buffers are bit-identical
    after a render and after a full train step."""
    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=2, max_depth=3,
                               tile_pixels=64, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    before = jax.tree_util.tree_map(np.array, (scene, cam))

    img, _ = rrt_tpu.render_image(scene, cam, cfg, 0)
    jax.block_until_ready(img)
    step = make_train_step(cfg, lr=1e-3)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    out = step(scene, cam, target, 0)
    jax.block_until_ready(out)

    after = jax.tree_util.tree_map(np.array, (scene, cam))
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_train_step_leaks_no_tracers():
    cfg = rrt_tpu.RenderConfig(width=16, height=8, spp=2, max_depth=3,
                               tile_pixels=64, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    with jax.check_tracer_leaks():
        step = make_train_step(cfg, lr=1e-3)
        s2, c2, loss = step(scene, cam, target, 0)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))


def test_enable_persistent_cache_respects_user_config(monkeypatch):
    """rrt_tpu.utils.cache.enable_persistent_cache must set the jax
    compilation cache dir (the env var alone is IGNORED by the TPU
    plugin — BASELINE.md round-5 addendum) while never clobbering a
    dir the user already configured."""
    import jax

    from rrt_tpu.utils.cache import enable_persistent_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        got = enable_persistent_cache("/tmp/rrt_cache_test")
        assert got == "/tmp/rrt_cache_test"
        assert jax.config.jax_compilation_cache_dir == "/tmp/rrt_cache_test"
        # an already-configured dir wins over the helper's default —
        # but update is still RE-ISSUED with that value: the config
        # VALUE being set (e.g. inherited from the env var at import)
        # is not sufficient on the TPU plugin; the update hook is what
        # initializes the cache.
        calls = []
        orig_update = jax.config.update

        def counting(name, value):
            calls.append((name, value))
            orig_update(name, value)

        monkeypatch.setattr(jax.config, "update", counting)
        got2 = enable_persistent_cache("/tmp/other")
        monkeypatch.undo()
        assert got2 == "/tmp/rrt_cache_test"
        assert ("jax_compilation_cache_dir",
                "/tmp/rrt_cache_test") in calls
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
