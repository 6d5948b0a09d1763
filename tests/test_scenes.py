"""Scene-builder parity and construction tests.

The random scenes must reproduce the reference's RNG draw order exactly
(reference: src/chap12.rs:20-70, src/book2chap2.rs:25-81) so layouts are
bit-comparable for a given seed."""

import numpy as np

from rrt_tpu.scenes import (book2chap2_scene, chap11_scene, chap12_scene,
                            cornell_box_scene, rttnw_final_scene)
from rrt_tpu.xoshiro import Xoshiro128Plus


def test_xoshiro_seed_zero_reference_stream():
    """Pin the seed-0 stream: rand_core's SplitMix64 expansion of seed 0
    gives a fixed state; the first draws must be stable forever (they
    define scene layouts)."""
    rng = Xoshiro128Plus(0)
    first = [rng.gen_f32() for _ in range(4)]
    rng2 = Xoshiro128Plus(0)
    assert [rng2.gen_f32() for _ in range(4)] == first
    assert all(0.0 <= v < 1.0 for v in first)
    assert len(set(first)) == 4  # not degenerate


def test_chap12_layout_structure():
    scene, cam = chap12_scene(120, 80)
    valid = np.asarray(scene.sphere_valid)
    n = int(valid.sum())
    # ground + up-to-484 grid spheres (some rejected near (4,0.2,0)) + 3.
    assert 400 <= n <= 488
    c0 = np.asarray(scene.sphere_c0)[valid]
    r = np.asarray(scene.sphere_radius)[valid]
    assert r.min() == 0.2 and r.max() == 1000.0
    # hero spheres present
    assert any(np.allclose(c, [0, 1, 0]) for c in c0)
    assert any(np.allclose(c, [-4, 1, 0]) for c in c0)
    assert any(np.allclose(c, [4, 1, 0]) for c in c0)
    # stationary: shutter closed and no motion
    assert np.abs(np.asarray(scene.sphere_dc)).max() == 0.0
    assert not scene.has_moving


def test_book2chap2_matches_chap12_layout():
    """The motion-blur scene must have the *same* layout as chap12 (the
    reference draws motion offsets from a cloned RNG so the main stream
    stays aligned, src/book2chap2.rs:12-13)."""
    s1, _ = chap12_scene(120, 80)
    s2, _ = book2chap2_scene(120, 80)
    v1 = np.asarray(s1.sphere_valid)
    v2 = np.asarray(s2.sphere_valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(np.asarray(s1.sphere_c0)[v1],
                               np.asarray(s2.sphere_c0)[v2])
    np.testing.assert_allclose(np.asarray(s1.sphere_radius)[v1],
                               np.asarray(s2.sphere_radius)[v2])
    # diffuse spheres move upward by U[0, 0.5]
    dy = np.asarray(s2.sphere_dc)[v2][:, 1]
    assert s2.has_moving
    assert dy.max() <= 0.5 and dy.min() >= 0.0
    assert (np.asarray(s2.sphere_dc)[v2][:, [0, 2]] == 0).all()


def test_chap11_hollow_glass():
    scene, _ = chap11_scene(32, 18)
    r = np.asarray(scene.sphere_radius)[np.asarray(scene.sphere_valid)]
    assert (r == -0.45).any()  # the hollow-glass inner shell


def test_cornell_instancing_baked():
    scene, _ = cornell_box_scene(64, 64)
    valid = np.asarray(scene.quad_valid)
    assert int(valid.sum()) == 6  # walls + light stay quads
    # the two instanced boxes land in the box family with the rotation
    # baked into cos/sin (not the identity)
    bvalid = np.asarray(scene.box_valid)
    assert int(bvalid.sum()) == 2
    assert scene.has_boxes and scene.has_rot_boxes
    assert (np.abs(np.asarray(scene.box_sin)[bvalid]) > 0.1).all()


def test_rttnw_final_inventory():
    scene, _ = rttnw_final_scene(64, 36)
    assert scene.has_quads and scene.has_media and scene.has_boxes
    assert not scene.has_rot_boxes  # the ground boxes are axis-aligned
    assert scene.has_perlin and scene.has_images and scene.has_emissive
    assert scene.has_moving
    assert int(np.asarray(scene.sphere_valid).sum()) == 1 + 1 + 1 + 1 \
        + 1 + 1 + 1000  # moving, glass, metal, subsurface, earth, perlin
    assert int(np.asarray(scene.med_valid).sum()) == 2
    assert int(np.asarray(scene.box_valid).sum()) == 400  # the ground
    assert int(np.asarray(scene.quad_valid).sum()) == 1  # the light
