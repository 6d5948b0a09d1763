"""Gradient correctness: finite-difference checks of the differentiable
render w.r.t. geometry, material and camera parameters
(SURVEY.md §4 item 3).

Detached-sampling gradients are *interior* gradients: they capture how
shading changes as parameters move, but not the discontinuous silhouette
term (pixels flipping hit/miss), which finite differences do see. The
geometry checks therefore use spheres that fill the whole frame so no
silhouette is visible and FD == interior gradient.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import rrt_tpu
from rrt_tpu.camera import Camera
from rrt_tpu.diff import partition, render_loss
from rrt_tpu.scene import SceneBuilder

CFG = rrt_tpu.RenderConfig(width=24, height=16, spp=4, max_depth=4,
                           tile_pixels=24 * 16, samples_per_pass=4)


def _fullframe(material):
    """One sphere of the given material covering every pixel (fov 10 deg,
    sphere angular radius ~14.5 deg)."""
    b = SceneBuilder()
    mat = material(b)
    b.sphere((0.0, 0.0, -1.0), 0.5, mat)
    cam = Camera.create(look_from=(0.0, 0.0, 1.0), look_at=(0.0, 0.0, -1.0),
                        fov_deg=10.0, aspect=CFG.width / CFG.height)
    return b.build(), cam


def _fd_check(scene, cam, field, index, eps, rtol=0.12, atol=1e-4):
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    params = partition(scene)

    def loss_at(delta):
        p = dict(params)
        p[field] = p[field].at[index].add(delta)
        return float(render_loss(p, cam, scene, target, CFG, 0, None))

    g = jax.grad(render_loss)(params, cam, scene, target, CFG, 0, None)
    auto = float(g[field][index])
    fd = (loss_at(eps) - loss_at(-eps)) / (2.0 * eps)
    assert np.isfinite(auto)
    assert abs(auto - fd) <= atol + rtol * abs(fd), (
        f"{field}{index}: autodiff {auto:.6g} vs fd {fd:.6g}")
    return auto


def test_grad_sphere_radius():
    scene, cam = _fullframe(lambda b: b.lambertian((0.6, 0.3, 0.2)))
    _fd_check(scene, cam, "sphere_radius", (0,), eps=1e-3)


def test_grad_sphere_center():
    scene, cam = _fullframe(lambda b: b.lambertian((0.6, 0.3, 0.2)))
    _fd_check(scene, cam, "sphere_c0", (0, 1), eps=1e-3)


def test_grad_albedo():
    scene, cam = _fullframe(lambda b: b.lambertian((0.6, 0.3, 0.2)))
    auto = _fd_check(scene, cam, "tex_color1", (0, 0), eps=1e-3)
    assert auto != 0.0


def test_grad_metal_fuzz():
    scene, cam = _fullframe(lambda b: b.metal((0.8, 0.7, 0.6), fuzz=0.3))
    _fd_check(scene, cam, "mat_fuzz", (0,), eps=1e-3)


def test_grad_camera():
    scene, cam = _fullframe(lambda b: b.lambertian((0.6, 0.3, 0.2)))
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    params = partition(scene)

    def loss_cam(delta):
        c2 = dataclasses.replace(
            cam, look_from=cam.look_from.at[1].add(delta))
        return float(render_loss(params, c2, scene, target, CFG, 0, None))

    g = jax.grad(render_loss, argnums=1)(params, cam, scene, target, CFG,
                                         0, None)
    auto = float(g.look_from[1])
    eps = 1e-3
    fd = (loss_cam(eps) - loss_cam(-eps)) / (2.0 * eps)
    assert np.isfinite(auto)
    assert abs(auto - fd) <= 1e-4 + 0.15 * abs(fd), (auto, fd)


def test_grad_dielectric_ior():
    scene, cam = _fullframe(lambda b: b.dielectric(1.5))
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    params = partition(scene)
    g = jax.grad(render_loss)(params, cam, scene, target, CFG, 0, None)
    auto = float(g["mat_ior"][0])
    assert np.isfinite(auto)

    def loss_at(delta):
        p = dict(params)
        p["mat_ior"] = p["mat_ior"].at[0].add(delta)
        return float(render_loss(p, cam, scene, target, CFG, 0, None))

    eps = 2e-3
    fd = (loss_at(eps) - loss_at(-eps)) / (2.0 * eps)
    # Detached sampling drops the Schlick-threshold probability derivative
    # (the reflect-vs-refract decision is replayed, not differentiated), so
    # the interior gradient is biased for glass by construction — it can
    # even be near zero while FD sees decision flips. Contract: finite and
    # not wildly larger than FD.
    assert abs(auto) < 10.0 * abs(fd) + 1e-3, (auto, fd)


def test_optimization_recovers_albedo():
    """End-to-end inverse rendering: recover a known albedo by gradient
    descent from a rendered target."""
    scene, cam = _fullframe(lambda b: b.lambertian((0.6, 0.3, 0.2)))
    target, _ = rrt_tpu.render_image(scene, cam, CFG, 0,
                                     differentiable=False)

    wrong = dataclasses.replace(
        scene, tex_color1=scene.tex_color1.at[0].set(
            jnp.array([0.3, 0.6, 0.5], jnp.float32)))
    params = partition(wrong)
    grad_fn = jax.jit(jax.grad(render_loss), static_argnames=("cfg",))
    # Mini-Adam on the albedo entry only (scale-free convergence).
    m = v = jnp.zeros(3)
    lr, b1, b2 = 0.05, 0.9, 0.999
    for i in range(100):
        g = grad_fn(params, cam, wrong, target, CFG, 0, None)
        gg = g["tex_color1"][0]
        m = b1 * m + (1 - b1) * gg
        v = b2 * v + (1 - b2) * gg * gg
        mh = m / (1 - b1 ** (i + 1))
        vh = v / (1 - b2 ** (i + 1))
        new = params["tex_color1"][0] - lr * mh / (jnp.sqrt(vh) + 1e-8)
        params["tex_color1"] = params["tex_color1"].at[0].set(
            jnp.clip(new, 0.0, 1.0))
    got = np.asarray(params["tex_color1"][0])
    np.testing.assert_allclose(got, [0.6, 0.3, 0.2], atol=0.05)


def test_grad_quad_geometry():
    """Quad vertex gradients (full-frame parallelogram, lambertian)."""
    b = SceneBuilder()
    b.quad((-3.0, -3.0, -2.0), (6.0, 0.0, 0.0), (0.0, 6.0, 0.0),
           b.lambertian((0.5, 0.4, 0.3)))
    scene = b.build()
    cam = Camera.create(look_from=(0.0, 0.0, 1.0), look_at=(0.0, 0.0, -1.0),
                        fov_deg=30.0, aspect=CFG.width / CFG.height)
    _fd_check(scene, cam, "quad_q", (0, 2), eps=1e-3)


def test_grad_box_geometry():
    """Box-family center/half gradients (full-frame axis-aligned box
    face, lambertian): the slab-test t is differentiable a.e. and the
    face-pick argmax is detached."""
    b = SceneBuilder()
    b.box((-3.0, -3.0, -2.5), (3.0, 3.0, -2.0),
          b.lambertian((0.5, 0.4, 0.3)))
    scene = b.build()
    assert scene.has_boxes
    cam = Camera.create(look_from=(0.0, 0.0, 1.0), look_at=(0.0, 0.0, -1.0),
                        fov_deg=30.0, aspect=CFG.width / CFG.height)
    _fd_check(scene, cam, "box_center", (0, 2), eps=1e-3)
    _fd_check(scene, cam, "box_half", (0, 2), eps=1e-3)
