"""BVH build + traversal: hit-equivalence vs the brute-force scan — the
reference's own oracle pattern kept alive (src/lib.rs:32-47; SURVEY.md §4
item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu import rng
from rrt_tpu.accel import INF, build_sphere_bvh, bvh_intersect_spheres
from rrt_tpu.camera import generate_rays
from rrt_tpu.geometry import intersect_spheres
from rrt_tpu.scenes import book2chap2_scene, chap11_scene, chap12_scene


def _rays(cam, n, w, h, seed=5):
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % w, (ids // w) % h
    keys = rng.sample_keys(jax.random.key(seed),
                           (py * w + px).astype(jnp.uint32), 0)
    return generate_rays(cam, px, py, w, h, keys)


def _equiv(scene, cam, n=512, w=64, h=36):
    bvh = build_sphere_bvh(scene)
    o, d, tm = _rays(cam, n, w, h)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    t_max = jnp.full((n,), INF, jnp.float32)
    tb, ib = intersect_spheres(scene, o, d, tm, t_min, t_max)
    tv, iv = bvh_intersect_spheres(scene, bvh, o, d, tm, t_min, t_max)
    hit = np.asarray(tb) < 1e30
    np.testing.assert_allclose(np.asarray(tv)[hit], np.asarray(tb)[hit],
                               rtol=1e-5, atol=1e-5)
    assert bool((np.asarray(tv)[~hit] >= 1e30).all())
    # Winner indices equal except measure-zero ties.
    mism = (np.asarray(iv)[hit] != np.asarray(ib)[hit]).mean()
    assert mism < 0.01, f"{mism:.2%} winner mismatches"
    return bvh


def test_bvh_matches_bruteforce_chap12():
    scene, cam = chap12_scene(64, 36)
    bvh = _equiv(scene, cam)
    n_valid = int(np.asarray(scene.sphere_valid).sum())
    counts = np.asarray(bvh.prim_count)
    leaves = counts[np.asarray(bvh.left) == -1]
    assert leaves.sum() == n_valid
    assert leaves.max() <= 4


def test_bvh_matches_bruteforce_moving():
    scene, cam = book2chap2_scene(64, 36)
    _equiv(scene, cam)


def test_bvh_matches_bruteforce_chap11():
    """Includes the hollow-glass negative radius (|r| bounds the AABB)."""
    scene, cam = chap11_scene(64, 36)
    _equiv(scene, cam)


def test_bvh_equalcount_method():
    scene, cam = chap12_scene(48, 27)
    bvh = build_sphere_bvh(scene, method="equal-count")
    n = 256
    o, d, tm = _rays(cam, n, 48, 27)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    t_max = jnp.full((n,), INF, jnp.float32)
    tb, _ = intersect_spheres(scene, o, d, tm, t_min, t_max)
    tv, _ = bvh_intersect_spheres(scene, bvh, o, d, tm, t_min, t_max)
    hit = np.asarray(tb) < 1e30
    np.testing.assert_allclose(np.asarray(tv)[hit], np.asarray(tb)[hit],
                               rtol=1e-5, atol=1e-5)
