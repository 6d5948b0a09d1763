"""The native C++ golden tracer must agree with both the Python golden
oracle and the device renderer (three independent implementations of the
books' method; SURVEY.md §7 'native host golden')."""

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu import golden, golden_native, rng
from rrt_tpu.camera import generate_rays
from rrt_tpu.render import trace_batch
from rrt_tpu.scenes import chap12_scene, cornell_smoke_scene

MAX_DEPTH = 8


def _setup(scene, cam, n_rays, width, height):
    ids = jnp.arange(n_rays, dtype=jnp.int32)
    px = ids % width
    py = (ids // width) % height
    gid = (py * width + px).astype(jnp.uint32)
    keys = rng.sample_keys(jax.random.key(3), gid, 0)
    o, d, tm = generate_rays(cam, px, py, width, height, keys)
    o_np = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)],
                    axis=-1)
    d_np = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)],
                    axis=-1)
    draws = golden.extract_draws(keys, scene.n_media, MAX_DEPTH)
    return o, d, tm, o_np, d_np, np.asarray(tm), keys, draws


def _native_vs_python(scene, cam, n_rays=64, width=32, height=18):
    (o, d, tm, o_np, d_np, tm_np, keys, draws) = _setup(
        scene, cam, n_rays, width, height)
    native = golden_native.trace(scene, o_np, d_np, tm_np, draws,
                                 MAX_DEPTH)
    gs = golden.GoldenScene(scene)
    py_out = np.stack([
        golden.trace_ray(gs, o_np[i], d_np[i], float(tm_np[i]), i, draws,
                         MAX_DEPTH) for i in range(n_rays)])
    close = np.all(np.abs(native - py_out) <= 1e-3
                   + 0.02 * np.abs(py_out), axis=-1)
    assert float(np.mean(close)) >= 0.95, (
        f"native golden disagrees with python golden: "
        f"{np.mean(close):.2%} match")
    return o, d, tm, keys, native


def test_native_matches_python_chap12():
    scene, cam = chap12_scene(32, 18)
    _native_vs_python(scene, cam)


def test_native_matches_python_cornell_smoke():
    scene, cam = cornell_smoke_scene(32, 32)
    _native_vs_python(scene, cam, width=32, height=32)


def test_native_matches_device():
    scene, cam = chap12_scene(32, 18)
    o, d, tm, keys, native = _native_vs_python(scene, cam)
    rad_v3, _ = trace_batch(scene, o, d, tm, keys, MAX_DEPTH, t_min=1e-3,
                            differentiable=False)
    device = np.stack([np.asarray(rad_v3.x), np.asarray(rad_v3.y),
                       np.asarray(rad_v3.z)], axis=-1)
    close = np.all(np.abs(native - device) <= 2e-2
                   + 0.05 * np.abs(device), axis=-1)
    assert float(np.mean(close)) >= 0.9, (
        f"native golden disagrees with device renderer: "
        f"{np.mean(close):.2%} match")


def test_native_matches_python_earth():
    """Image-texture path through the C++ golden."""
    from rrt_tpu.scenes import earth_scene
    scene, cam = earth_scene(32, 18)
    _native_vs_python(scene, cam)
