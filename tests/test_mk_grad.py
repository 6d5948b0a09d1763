"""Fused-chain backward (ops.megakernel_vjp) vs the XLA scan path.

The custom_vjp bounce chain must produce the same forward radiance and
the same gradients (scene params + camera) as trace_batch's
rematerialized scan, which is itself FD-verified in test_grad.py. Runs
in Pallas interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import rrt_tpu.ops.megakernel as mk
import rrt_tpu.ops.megakernel_vjp as mkv
from rrt_tpu import rng
from rrt_tpu.camera import generate_rays
from rrt_tpu.diff import combine, partition
from rrt_tpu.render import trace_batch, trace_batch_fused
from rrt_tpu.scenes import (book2chap2_scene, chap12_scene,
                            cornell_box_scene, earth_scene)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mk.pl, "pallas_call", interp)
    monkeypatch.setattr(mkv.pl, "pallas_call", interp)


def _compare(scene, cam, w, h, max_depth=3, schedule=(2, 2), n=None,
             rtol=2e-3, rr_depth=0):
    n = mk.TN if n is None else n  # chains need TN-aligned batches
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % w, (ids // w) % h
    keys = rng.sample_keys(jax.random.key(0),
                           (py * w + px).astype(jnp.uint32), 0)
    weight = jnp.sin(jnp.arange(n) * 0.1)

    def make_loss(fused):
        def loss(params, camera):
            s = combine(scene, params)
            o, d, tm = generate_rays(camera, px, py, w, h, keys)
            if fused:
                rad, _ = trace_batch_fused(s, o, d, tm, keys, max_depth,
                                           1e-3, schedule=schedule,
                                           rr_depth=rr_depth)
            else:
                rad, _ = trace_batch(s, o, d, tm, keys, max_depth, 1e-3,
                                     differentiable=True,
                                     rr_depth=rr_depth)
            return jnp.sum(weight * (rad.x + 0.7 * rad.y + 0.3 * rad.z))

        return loss

    params = partition(scene)
    lf, ls = make_loss(True), make_loss(False)
    vf, vs = float(lf(params, cam)), float(ls(params, cam))
    assert vf == pytest.approx(vs, rel=1e-5), (vf, vs)

    gfp, gfc = jax.grad(lf, argnums=(0, 1))(params, cam)
    gsp, gsc = jax.grad(ls, argnums=(0, 1))(params, cam)
    for k in sorted(gsp):
        a, b = np.asarray(gfp[k]), np.asarray(gsp[k])
        assert np.isfinite(a).all(), f"nonfinite fused grad for {k}"
        scale = max(np.abs(b).max(), 1e-4)
        np.testing.assert_allclose(a, b, atol=rtol * scale,
                                   err_msg=f"param {k}")
    # Camera tolerance: the loss is discontinuous in camera params, so
    # the analytic gradient is a small residual of large cancelling
    # per-ray terms; ulp-level fusion differences between the kernel
    # and XLA expression trees accumulate with batch size (measured:
    # ~0.5% at n=512, ~2% at n=1024 on chap12 with path-identical
    # forwards — see test_tile_grad for the full analysis).
    for f in dataclasses.fields(gsc):
        a = np.asarray(getattr(gfc, f.name))
        b = np.asarray(getattr(gsc, f.name))
        scale = max(np.abs(b).max(), 1e-4)
        np.testing.assert_allclose(a, b, atol=3e-2 * scale,
                                   err_msg=f"camera {f.name}")


def test_chain_grads_chap12():
    scene, cam = chap12_scene(32, 18)
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 18)


@pytest.mark.slow
def test_chain_grads_russian_roulette():
    """cfg.rr_depth through the fused-vjp chain path (round 4): the RR
    kill replays, the 1/p weight is detached — gradients must match the
    XLA scan path with the same rr (same STREAM_RR draws)."""
    scene, cam = chap12_scene(32, 18)
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 18, max_depth=5, schedule=(3, 3),
             rr_depth=2)


@pytest.mark.slow
def test_chain_grads_cornell_quads_emissive():
    """Quads + emissive light through the fused-vjp chain. The stock
    cornell scene now carries its boxes in the box family (out of
    kernel-vjp scope), so build the 6-quad decomposition explicitly."""
    from rrt_tpu.scene import SceneBuilder
    from rrt_tpu.scenes.book2 import _cornell_camera, _cornell_walls
    b = SceneBuilder()
    b.solid_background((0.0, 0.0, 0.0))
    white = _cornell_walls(b, (15.0, 15.0, 15.0), (213.0, 554.0, 227.0),
                           (130.0, 0.0, 0.0), (0.0, 0.0, 105.0))
    b._box_as_quads((0.0, 0.0, 0.0), (165.0, 330.0, 165.0), white, 15.0,
                    (265.0, 0.0, 295.0))
    b._box_as_quads((0.0, 0.0, 0.0), (165.0, 165.0, 165.0), white, -18.0,
                    (130.0, 0.0, 65.0))
    scene, cam = b.build(), _cornell_camera(32, 32)
    assert not scene.has_boxes
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 32)


@pytest.mark.slow
def test_chain_grads_cornell_box_family():
    """The stock cornell scene (rotated box-family primitives) through
    the fused-vjp chain: slab-face t and rotated normals re-derived from
    the winner rows; d_sel_b scatters through the one-hot transpose.
    Gradients for box_center/box_half must match the XLA scan path,
    which differentiates geometry.intersect_boxes directly."""
    scene, cam = cornell_box_scene(32, 32)
    assert scene.has_boxes and scene.has_rot_boxes
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 32)


@pytest.mark.slow
def test_chain_grads_axis_aligned_boxes():
    """Axis-aligned box family (the RTTNW-ground shape) with a sky
    background and a sphere alongside."""
    from rrt_tpu.camera import Camera
    from rrt_tpu.scene import SceneBuilder
    b = SceneBuilder()
    b.box((-2.0, -1.2, -4.0), (2.0, -0.6, -2.0),
          b.lambertian((0.4, 0.6, 0.3)))
    b.box((-0.6, -0.6, -3.4), (0.6, 0.6, -2.6),
          b.metal((0.8, 0.7, 0.6), 0.05))
    b.sphere((1.2, 0.2, -3.0), 0.5, b.lambertian((0.7, 0.2, 0.2)))
    scene = b.build()
    assert scene.has_boxes and not scene.has_rot_boxes
    assert mkv.supports_backward(scene)
    # Non-zero aperture so the focus_dist gradient is a real signal
    # (at aperture 0 it is analytically zero and both paths return
    # roundoff dust that the relative check can't compare).
    cam = Camera.create(look_from=(0.0, 0.8, 1.5),
                        look_at=(0.0, -0.2, -3.0), fov_deg=45.0,
                        aspect=1.0, aperture=0.2, focus_dist=4.5)
    _compare(scene, cam, 32, 32)


@pytest.mark.slow
def test_chain_grads_moving_spheres():
    scene, cam = book2chap2_scene(32, 18)
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 18)


@pytest.mark.slow
def test_chain_grads_image_texture():
    scene, cam = earth_scene(32, 18)
    assert mkv.supports_backward(scene)
    _compare(scene, cam, 32, 18)


def test_media_scene_out_of_scope():
    from rrt_tpu.scenes import cornell_smoke_scene
    scene, _ = cornell_smoke_scene(16, 16)
    assert not mkv.supports_backward(scene)


def test_chain_forward_matches_nondiff():
    """The chain's primal must equal the plain forward megakernel."""
    scene, cam = chap12_scene(32, 18)
    n = mk.TN
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % 32, (ids // 32) % 18
    keys = rng.sample_keys(jax.random.key(3),
                           (py * 32 + px).astype(jnp.uint32), 0)
    o, d, tm = generate_rays(cam, px, py, 32, 18, keys)
    rad, ntr = trace_batch_fused(scene, o, d, tm, keys, 4, 1e-3,
                                 schedule=(2, 3))
    rad2, ntr2 = trace_batch(scene, o, d, tm, keys, 4, 1e-3,
                             differentiable=False)
    np.testing.assert_allclose(np.asarray(rad.x), np.asarray(rad2.x),
                               atol=2e-4)
    assert float(ntr) == float(ntr2)
