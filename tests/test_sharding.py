"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4
item 4): shard-vs-single equivalence, mesh-factorization invariance, and
the full sharded training step."""

import jax
import jax.numpy as jnp
import numpy as np

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
