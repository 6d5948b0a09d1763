"""Queue-compaction driver: must produce the *identical* image to the
batch driver (per-sample keyed RNG makes radiance independent of driver,
queue size, and batching)."""

import jax
import numpy as np

import rrt_tpu
from rrt_tpu.render import render_image_queue
from rrt_tpu.scenes import chap11_scene, cornell_smoke_scene, diffuse_scene


def _cfg(**kw):
    base = dict(width=48, height=27, spp=8, max_depth=8, tile_pixels=432,
                samples_per_pass=2, queue_size=2048)
    base.update(kw)
    return rrt_tpu.RenderConfig(**base)


def test_queue_matches_batch():
    cfg = _cfg()
    scene, cam = diffuse_scene(cfg.width, cfg.height)
    img_b, n_b = rrt_tpu.render_image(scene, cam, cfg, 0)
    img_q, n_q = render_image_queue(scene, cam, cfg, 0)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_q),
                               atol=1e-5, rtol=1e-5)
    assert int(n_b) == int(n_q)


def test_queue_size_invariance():
    scene, cam = chap11_scene(48, 27)
    imgs = []
    for q in (512, 2048, 8192):
        img, _ = render_image_queue(scene, cam, _cfg(queue_size=q), 0)
        imgs.append(np.asarray(img))
    # Per-sample radiance is bit-identical; only the accumulation *order*
    # into the pixel sum changes with queue size (f32 non-associativity).
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(imgs[1], imgs[2], atol=1e-5, rtol=1e-5)


def test_queue_media_scene():
    cfg = _cfg(width=32, height=32)
    scene, cam = cornell_smoke_scene(cfg.width, cfg.height)
    img_b, _ = rrt_tpu.render_image(scene, cam, cfg, 0)
    img_q, _ = render_image_queue(scene, cam, cfg, 0)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_q),
                               atol=1e-5, rtol=1e-5)


def test_no_tracer_leaks():
    """SURVEY.md §5.2: the reference needed (and lacked) a race detector
    for its unsafe thread-local RNG; here shared mutable state doesn't
    exist, and this guard checks the render graph for leaked tracers —
    the closest JAX hazard class."""
    import jax
    cfg = _cfg(width=16, height=9, spp=2, queue_size=512, tile_pixels=144,
               samples_per_pass=2)
    scene, cam = diffuse_scene(cfg.width, cfg.height)
    with jax.check_tracer_leaks():
        img, _ = rrt_tpu.render_image(scene, cam, cfg, 1)
        img.block_until_ready()
