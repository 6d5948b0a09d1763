"""Golden-oracle equivalence: the wavefront device renderer must match the
scalar recursive NumPy tracer per-ray when both consume identical random
draws (SURVEY.md §4 item 2).

A small fraction of rays may legitimately diverge (float32 vs float64
decisions near argmin ties / dielectric thresholds flip the whole path), so
the assertion is on the match fraction, not on every ray.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrt_tpu import golden, rng
from rrt_tpu.camera import generate_rays
from rrt_tpu.render import trace_batch
from rrt_tpu.scenes import (chap11_scene, chap12_scene, cornell_box_scene,
                            cornell_smoke_scene, diffuse_scene,
                            rttnw_final_scene, simple_light_scene)

MAX_DEPTH = 8


def _compare(scene, cam, n_rays=192, width=32, height=18, seed=7,
             min_match=0.99, atol=2e-3, rel=0.01):
    seed_key = jax.random.key(seed)
    ids = jnp.arange(n_rays, dtype=jnp.int32)
    px = ids % width
    py = (ids // width) % height
    gid = (py * width + px).astype(jnp.uint32)
    keys = rng.sample_keys(seed_key, gid, 0)
    o, d, tm = generate_rays(cam, px, py, width, height, keys)

    rad_v3, _ = trace_batch(scene, o, d, tm, keys, MAX_DEPTH,
                            t_min=1e-3, differentiable=False)
    radiance = np.stack([np.asarray(rad_v3.x), np.asarray(rad_v3.y),
                         np.asarray(rad_v3.z)], axis=-1)

    gs = golden.GoldenScene(scene)
    draws = golden.extract_draws(keys, scene.n_media, MAX_DEPTH)
    o_np = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)],
                    axis=-1)
    d_np = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)],
                    axis=-1)
    tm_np = np.asarray(tm)
    expected = np.stack([
        golden.trace_ray(gs, o_np[i], d_np[i], float(tm_np[i]), i, draws,
                         MAX_DEPTH) for i in range(n_rays)])

    close = np.all(np.abs(radiance - expected) <= atol
                   + rel * np.abs(expected), axis=-1)
    frac = float(np.mean(close))
    assert frac >= min_match, (
        f"only {frac:.2%} of rays match golden; worst err "
        f"{np.max(np.abs(radiance - expected)):.4f}")


def test_diffuse_matches_golden():
    scene, cam = diffuse_scene(32, 18)
    _compare(scene, cam)


def test_chap11_matches_golden():
    scene, cam = chap11_scene(32, 18)
    _compare(scene, cam)


def test_chap12_matches_golden():
    scene, cam = chap12_scene(32, 18)
    _compare(scene, cam)


def test_simple_light_matches_golden():
    scene, cam = simple_light_scene(32, 18)
    _compare(scene, cam)


def test_cornell_matches_golden():
    scene, cam = cornell_box_scene(32, 32)
    _compare(scene, cam, width=32, height=32)


def test_cornell_smoke_matches_golden():
    scene, cam = cornell_smoke_scene(32, 32)
    _compare(scene, cam, width=32, height=32)


@pytest.mark.slow
def test_rttnw_final_matches_golden():
    scene, cam = rttnw_final_scene(32, 18)
    _compare(scene, cam, n_rays=48)


def test_earth_image_texture_matches_golden():
    from rrt_tpu.scenes import earth_scene
    scene, cam = earth_scene(32, 18)
    _compare(scene, cam)


def test_earth_file_loaded_image_matches_golden(tmp_path):
    """End-to-end real-image path (VERDICT r3 #9): a non-procedural
    image written to disk, loaded through io.read_image, mounted on the
    earth sphere, must trace identically to the golden oracle sampling
    the same atlas."""
    from rrt_tpu import io as rio
    from rrt_tpu.scenes import earth_scene

    rg = np.random.default_rng(3)
    img8 = rg.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    p = str(tmp_path / "tex.ppm")
    rio.write_ppm(p, img8)
    loaded = rio.read_image(p)
    np.testing.assert_allclose(loaded, img8.astype(np.float32) / 255.0)
    scene, cam = earth_scene(32, 18, image=loaded)
    _compare(scene, cam)


def test_checker_ground_matches_golden():
    from rrt_tpu.scenes import book2chap2_scene
    scene, cam = book2chap2_scene(32, 18, checker=True)
    _compare(scene, cam)
