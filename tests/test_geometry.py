"""Unit tests for batched intersection math (SURVEY.md §4 item 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrt_tpu.geometry import (FAM_SPHERE, INF, intersect_all,
                              intersect_quads, intersect_spheres, make_hit)
from rrt_tpu.scene import SceneBuilder
from rrt_tpu.vec import V3


def _v3(vals):
    a = jnp.asarray([vals], jnp.float32)
    return V3(a[:, 0], a[:, 1], a[:, 2])


def _ray(o, d):
    return (_v3(o), _v3(d), jnp.zeros((1,), jnp.float32))


def _bounds(n=1):
    return (jnp.full((n,), 1e-3, jnp.float32), jnp.full((n,), INF,
                                                        jnp.float32))


def _unit_sphere_scene():
    b = SceneBuilder()
    b.sphere((0.0, 0.0, 0.0), 1.0, b.lambertian((0.5, 0.5, 0.5)))
    return b.build()


class TestSphere:
    def test_two_roots_takes_near(self):
        scene = _unit_sphere_scene()
        o, d, tm = _ray((0, 0, 5), (0, 0, -1))
        t, idx = intersect_spheres(scene, o, d, tm, *_bounds())
        assert np.isclose(float(t[0]), 4.0, atol=1e-5)
        assert int(idx[0]) == 0

    def test_inside_takes_far_root(self):
        scene = _unit_sphere_scene()
        o, d, tm = _ray((0, 0, 0), (0, 0, -1))
        t, _ = intersect_spheres(scene, o, d, tm, *_bounds())
        assert np.isclose(float(t[0]), 1.0, atol=1e-5)

    def test_t_window_rejection(self):
        scene = _unit_sphere_scene()
        o, d, tm = _ray((0, 0, 5), (0, 0, -1))
        t_min = jnp.full((1,), 1e-3, jnp.float32)
        t_max = jnp.full((1,), 3.0, jnp.float32)  # both roots beyond
        t, _ = intersect_spheres(scene, o, d, tm, t_min, t_max)
        assert float(t[0]) >= float(INF)

    def test_miss(self):
        scene = _unit_sphere_scene()
        o, d, tm = _ray((0, 0, 5), (0, 1, 0))
        t, _ = intersect_spheres(scene, o, d, tm, *_bounds())
        assert float(t[0]) >= float(INF)

    def test_negative_radius_flips_normal(self):
        """The hollow-glass trick (reference src/chap11.rs:38-42): |r| bounds
        the surface, sign flips the outward normal."""
        b = SceneBuilder()
        b.sphere((0.0, 0.0, 0.0), -1.0, b.dielectric(1.5))
        scene = b.build()
        o, d, tm = _ray((0, 0, 5), (0, 0, -1))
        tmin, tmax = _bounds()
        t, idx = intersect_spheres(scene, o, d, tm, tmin, tmax)
        assert np.isclose(float(t[0]), 4.0, atol=1e-5)
        fam = jnp.asarray([FAM_SPHERE], jnp.int32)
        hit = make_hit(scene, o, d, tm, t, fam, idx)
        # Outward normal at (0,0,1) with r=-1 points inward (0,0,-1); the
        # ray travels -z so d.outward < 0 is False -> front_face False,
        # and the shading normal is flipped back to +z.
        assert not bool(hit.front_face[0])
        nrm = [float(hit.normal.x[0]), float(hit.normal.y[0]),
               float(hit.normal.z[0])]
        assert np.allclose(nrm, [0, 0, 1], atol=1e-5)

    def test_moving_sphere_center_lerp(self):
        b = SceneBuilder()
        b.moving_sphere((0, 0, 0), (2, 0, 0), 0.0, 1.0, 0.5,
                        b.lambertian((0.5, 0.5, 0.5)))
        scene = b.build()
        o = _v3((1.0, 0.0, 5.0))
        d = _v3((0.0, 0.0, -1.0))
        tm = jnp.asarray([0.5], jnp.float32)  # center at (1,0,0)
        t, _ = intersect_spheres(scene, o, d, tm, *_bounds())
        assert np.isclose(float(t[0]), 4.5, atol=1e-5)

    def test_shrinking_t_max_picks_closest(self):
        b = SceneBuilder()
        m = b.lambertian((0.5, 0.5, 0.5))
        b.sphere((0.0, 0.0, -10.0), 1.0, m)
        b.sphere((0.0, 0.0, -5.0), 1.0, m)
        scene = b.build()
        o, d, tm = _ray((0, 0, 0), (0, 0, -1))
        t, idx = intersect_spheres(scene, o, d, tm, *_bounds())
        assert int(idx[0]) == 1
        assert np.isclose(float(t[0]), 4.0, atol=1e-5)


class TestQuad:
    def _quad_scene(self):
        b = SceneBuilder()
        b.quad((-1.0, -1.0, -2.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0),
               b.lambertian((0.5, 0.5, 0.5)))
        return b.build()

    def test_center_hit(self):
        scene = self._quad_scene()
        o, d, tm = _ray((0, 0, 0), (0, 0, -1))
        t, idx = intersect_quads(scene, o, d, *_bounds())
        assert np.isclose(float(t[0]), 2.0, atol=1e-5)

    def test_outside_parallelogram(self):
        scene = self._quad_scene()
        o, d, tm = _ray((1.5, 0, 0), (0, 0, -1))
        t, _ = intersect_quads(scene, o, d, *_bounds())
        assert float(t[0]) >= float(INF)

    def test_parallel_ray_misses(self):
        scene = self._quad_scene()
        o, d, tm = _ray((0, 0, 0), (1, 0, 0))
        t, _ = intersect_quads(scene, o, d, *_bounds())
        assert float(t[0]) >= float(INF)

    def test_uv_coordinates(self):
        scene = self._quad_scene()
        o, d, tm = _ray((0.5, -0.5, 0), (0, 0, -1))
        tmin, tmax = _bounds()
        u_med = None
        t, fam, idx, mask = intersect_all(scene, o, d, tm, tmin, tmax,
                                          u_med)
        hit = make_hit(scene, o, d, tm, t, fam, idx)
        # q=(-1,-1), edges 2x2: point (0.5,-0.5) -> alpha=0.75, beta=0.25
        assert np.allclose([float(hit.u[0]), float(hit.v[0])],
                           [0.75, 0.25], atol=1e-5)


class TestMedium:
    def test_certain_scatter_inside(self):
        """With u ~ 1 (log(u) ~ 0) the scatter distance is ~0, so the hit
        lands at the interval entry."""
        b = SceneBuilder()
        b.medium_sphere((0.0, 0.0, 0.0), 1.0, density=10.0,
                        albedo=(1, 1, 1))
        scene = b.build()
        o, d, tm = _ray((0, 0, 5), (0, 0, -1))
        tmin, tmax = _bounds()
        u_med = jnp.full((scene.n_media, 1), 0.999999, jnp.float32)
        t, fam, idx, mask = intersect_all(scene, o, d, tm, tmin, tmax,
                                          u_med)
        assert bool(mask[0])
        assert np.isclose(float(t[0]), 4.0, atol=1e-3)

    def test_low_density_passthrough(self):
        b = SceneBuilder()
        b.medium_sphere((0.0, 0.0, 0.0), 1.0, density=1e-6,
                        albedo=(1, 1, 1))
        scene = b.build()
        o, d, tm = _ray((0, 0, 5), (0, 0, -1))
        tmin, tmax = _bounds()
        u_med = jnp.full((scene.n_media, 1), 0.5, jnp.float32)
        t, fam, idx, mask = intersect_all(scene, o, d, tm, tmin, tmax,
                                          u_med)
        assert not bool(mask[0])

    def test_obb_boundary(self):
        b = SceneBuilder()
        b.medium_box((-1, -1, -1), (1, 1, 1), density=1000.0,
                     albedo=(1, 1, 1), rotate_y_deg=45.0)
        scene = b.build()
        o, d, tm = _ray((0, 0, 5), (0, 0, -1))
        tmin, tmax = _bounds()
        u_med = jnp.full((scene.n_media, 1), 0.9999, jnp.float32)
        t, fam, idx, mask = intersect_all(scene, o, d, tm, tmin, tmax,
                                          u_med)
        assert bool(mask[0])
        # Rotated 45deg about y: the corner edge faces +z at sqrt(2).
        assert np.isclose(float(t[0]), 5.0 - np.sqrt(2.0), atol=1e-2)


class TestBoxes:
    """Box primitive family vs the books' 6-quad decomposition: the one
    slab test must reproduce the same hits (t, outward normal,
    front_face), including inside-start rays hitting the far face."""

    @staticmethod
    def _pair(rot_deg):
        from rrt_tpu.geometry import FAM_BOX, FAM_NONE, FAM_QUAD, \
            intersect_boxes

        def build(as_family):
            b = SceneBuilder()
            m = b.lambertian((0.5, 0.5, 0.5))
            args = ((-1.0, -1.0, -1.0), (1.0, 2.0, 1.5), m)
            if as_family:
                b.box(*args, rotate_y_deg=rot_deg, translate=(0.5, 0, -3))
            else:
                b._box_as_quads(*args, rot_deg, (0.5, 0.0, -3.0))
            return b.build()

        s_box, s_quad = build(True), build(False)
        assert s_box.has_boxes and not s_quad.has_boxes
        rs = np.random.RandomState(0)
        n = 2048
        o = V3(*(jnp.asarray(rs.uniform(-4, 4, n), jnp.float32)
                 for _ in range(3)))
        d = V3(*(jnp.asarray(rs.normal(size=n), jnp.float32)
                 for _ in range(3)))
        t_min = jnp.full((n,), 1e-3)
        t_max = jnp.full((n,), INF)
        tb, ib = intersect_boxes(s_box, o, d, t_min, t_max)
        tq, iq = intersect_quads(s_quad, o, d, t_min, t_max)
        tb_n, tq_n = np.asarray(tb), np.asarray(tq)
        hit = tb_n < 1e38
        assert (hit == (tq_n < 1e38)).all()
        assert hit.any()
        np.testing.assert_allclose(tb_n[hit], tq_n[hit], rtol=1e-5,
                                   atol=1e-5)
        tm = jnp.zeros((n,))
        fam_b = jnp.asarray(np.where(hit, FAM_BOX, FAM_NONE), jnp.int32)
        fam_q = jnp.asarray(np.where(hit, FAM_QUAD, FAM_NONE), jnp.int32)
        hb = make_hit(s_box, o, d, tm, tb, fam_b, ib)
        hq = make_hit(s_quad, o, d, tm, tq, fam_q, iq)
        for c in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(hb.normal, c))[hit],
                np.asarray(getattr(hq.normal, c))[hit], atol=1e-5)
        assert (np.asarray(hb.front_face)[hit]
                == np.asarray(hq.front_face)[hit]).all()

    def test_axis_aligned(self):
        self._pair(0.0)

    def test_rotated(self):
        self._pair(30.0)

    def test_inside_hits_far_face(self):
        from rrt_tpu.geometry import intersect_boxes
        b = SceneBuilder()
        b.box((-1, -1, -1), (1, 1, 1), b.lambertian((0.5, 0.5, 0.5)))
        scene = b.build()
        o, d, _ = _ray((0, 0, 0), (0, 0, 1))
        t, _ = intersect_boxes(scene, o, d, *_bounds())
        assert np.isclose(float(t[0]), 1.0, atol=1e-6)

    def test_image_textured_box_falls_back_to_quads(self):
        b = SceneBuilder()
        img = np.full((4, 4, 3), 0.5, np.float32)
        b.box((-1, -1, -1), (1, 1, 1), b.lambertian(b.image(img)))
        scene = b.build()
        assert not scene.has_boxes
        assert int(np.asarray(scene.quad_valid).sum()) == 6
