"""Megakernel regression tests (interpret mode on CPU).

One fused bounce step must agree with the XLA `_shade` step on every
kernel-supported scene family. Lanes whose f32 quadratic cancels
catastrophically may flip near-tie winners (both paths are equally valid
there), so agreement is fraction-based for state and exact for banked
radiance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import rrt_tpu.ops.megakernel as mk
from rrt_tpu import rng
from rrt_tpu.camera import generate_rays
from rrt_tpu.render import _shade
from rrt_tpu.scenes import (book2chap2_scene, chap12_scene,
                            cornell_box_scene, cornell_smoke_scene)
from rrt_tpu.vec import V3


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mk.pl, "pallas_call", interp)


def _one_step(scene, cam, w, h, n=1024):
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % w, (ids // w) % h
    keys = rng.sample_keys(jax.random.key(0),
                           (py * w + px).astype(jnp.uint32), 0)
    o, d, tm = generate_rays(cam, px, py, w, h, keys)
    alive = jnp.ones((n,), bool)
    bounce = jnp.zeros((n,), jnp.int32)

    contrib, no, nd, att, sv = _shade(scene, o, d, tm, keys, bounce,
                                      alive, 1e-3, 50, packed=None)

    st = mk.pack_state(o, d, tm, V3.ones((n,)), V3.zeros((n,)), bounce,
                       alive, jnp.zeros((n,)))
    quad24 = (mk.pack_quads_full(scene) if scene.has_quads
              else jnp.zeros((24, mk.TS), jnp.float32))
    box24 = mk.pack_boxes_full(scene) if scene.has_boxes else None
    atlas = mk.pack_atlas(scene) if scene.has_images else None
    st2 = mk.bounce_steps(
        st, keys, mk.pack_spheres_full(scene), quad24,
        mk.pack_media(scene), mk.pack_bg(scene), atlas,
        boxes24=box24, k_steps=1,
        moving=scene.has_moving, has_quads=scene.has_quads,
        has_boxes=scene.has_boxes, has_rot_boxes=scene.has_rot_boxes,
        has_perlin=scene.has_perlin, has_images=scene.has_images,
        img_ah=scene.images.shape[1], img_aw=scene.images.shape[2],
        n_media=scene.n_media if scene.has_media else 0, max_depth=50,
        t_min=1e-3)
    o2, d2, _, thr2, pend2, bounce2, alive2, traced = mk.unpack_state(st2)

    assert float(traced.sum()) == n
    # Survival decisions agree everywhere except possible near-tie flips.
    assert float((np.asarray(alive2) == np.asarray(sv)).mean()) > 0.99
    # Banked radiance (miss background + emission) matches exactly on
    # agreeing lanes.
    agree = np.asarray(alive2) == np.asarray(sv)
    for got, exp in ((pend2.x, contrib.x), (pend2.y, contrib.y),
                     (pend2.z, contrib.z)):
        diff = np.abs(np.asarray(got) - np.asarray(exp))[agree]
        assert diff.max() < 1e-4
    # In-kernel texture/albedo: the surviving lanes' throughput must
    # match the XLA attenuation. Image/perlin uv goes through the
    # kernel's polynomial inverse-trig, so a small fraction of lanes may
    # land on a neighboring texel — fraction-based with f32 tolerance.
    exp_thr = V3.where(sv, att, V3.ones((n,)))
    for got, exp in ((thr2.x, exp_thr.x), (thr2.y, exp_thr.y),
                     (thr2.z, exp_thr.z)):
        close = (np.abs(np.asarray(got) - np.asarray(exp)) < 2e-3)[agree]
        assert close.mean() > 0.97, f"throughput mismatch: {close.mean()}"
    # New origins agree on >90% of lanes (rest are f32-cancellation
    # winner flips, both self-consistent).
    exp_o = V3.where(sv, no, o)
    close = np.abs(np.asarray(o2.x - exp_o.x)) < 1e-3
    assert close.mean() > 0.9


def test_megakernel_chap12():
    scene, cam = chap12_scene(32, 18)
    _one_step(scene, cam, 32, 18)


def test_megakernel_cornell():
    scene, cam = cornell_box_scene(32, 32)
    _one_step(scene, cam, 32, 32)


def test_megakernel_moving():
    scene, cam = book2chap2_scene(32, 18)
    _one_step(scene, cam, 32, 18)


def test_megakernel_media():
    scene, cam = cornell_smoke_scene(32, 32)
    _one_step(scene, cam, 32, 32)


@pytest.mark.parametrize("scene_name", ["cornell", "chap11"])
def test_scalar_family_path_matches_tile(scene_name):
    """The scalar small-family path (fam_n static counts) must agree
    with the padded-tile path on multi-step state: same candidate
    formulas evaluated per slot instead of per tile, so in interpret
    mode the two are numerically interchangeable (near-tie winner flips
    only). Cornell exercises scalar quads+boxes plus the zero-sphere
    skip; chap11 exercises scalar spheres."""
    if scene_name == "cornell":
        scene, cam = cornell_box_scene(32, 32)
        w = h = 32
    else:
        from rrt_tpu.scenes import chap11_scene
        scene, cam = chap11_scene(32, 18)
        w, h = 32, 18
    assert max(scene.fam_n) <= mk.SMALL_FAMILY_MAX
    n = mk.TN
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % w, (ids // w) % h
    keys = rng.sample_keys(jax.random.key(3),
                           (py * w + px).astype(jnp.uint32), 0)
    o, d, tm = generate_rays(cam, px, py, w, h, keys)
    st = mk.pack_state(o, d, tm, V3.ones((n,)), V3.zeros((n,)),
                       jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool),
                       jnp.zeros((n,)))
    quad24 = (mk.pack_quads_full(scene) if scene.has_quads
              else jnp.zeros((24, mk.TS), jnp.float32))
    box24 = mk.pack_boxes_full(scene) if scene.has_boxes else None
    kw = dict(k_steps=3, moving=scene.has_moving,
              has_quads=scene.has_quads, has_boxes=scene.has_boxes,
              has_rot_boxes=scene.has_rot_boxes,
              has_perlin=scene.has_perlin, has_images=scene.has_images,
              img_ah=scene.images.shape[1],
              img_aw=scene.images.shape[2], n_media=0, max_depth=50,
              t_min=1e-3)
    args = (st, keys, mk.pack_spheres_full(scene), quad24,
            mk.pack_media(scene), mk.pack_bg(scene))
    st_tile = mk.bounce_steps(*args, boxes24=box24, fam_n=None, **kw)
    st_scal = mk.bounce_steps(*args, boxes24=box24, fam_n=scene.fam_n,
                              **kw)
    a, b = np.asarray(st_tile), np.asarray(st_scal)
    # Same formulas per slot, but (TS,TN)-tile vs (1,TN)-scalar
    # evaluation fuses differently, so continuous rows drift by ulps
    # (measured ~1e-4 at cornell's ~300-unit coordinates) and an
    # occasional lane flips a near-tie winner at a shared wall edge and
    # diverges — the same class the XLA-vs-kernel tests tolerate.
    agree = np.all(np.abs(a - b) <= 1e-3 * (1.0 + np.abs(a)), axis=0)
    assert agree.mean() > 0.98, f"scalar vs tile disagree: {agree.mean()}"


def test_megakernel_dead_tile_passthrough():
    scene, cam = chap12_scene(16, 9)
    n = mk.TN
    st = jnp.zeros((16, n), jnp.float32).at[3:6].set(1.0)
    st = st.at[15].set(7.0)  # traced counts must survive
    keys = rng.sample_keys(jax.random.key(0),
                           jnp.zeros((n,), jnp.uint32), 0)
    st2 = mk.bounce_steps(
        st, keys, mk.pack_spheres_full(scene),
        jnp.zeros((24, mk.TS), jnp.float32), mk.pack_media(scene),
        mk.pack_bg(scene), k_steps=2, moving=False, has_quads=False,
        n_media=0, max_depth=50, t_min=1e-3)
    np.testing.assert_array_equal(np.asarray(st2), np.asarray(st))


def test_megakernel_perlin():
    from rrt_tpu.scenes import simple_light_scene
    scene, cam = simple_light_scene(32, 18)
    assert mk.supports(scene)
    _one_step(scene, cam, 32, 18)


def test_megakernel_image_texture():
    from rrt_tpu.scenes import earth_scene
    scene, cam = earth_scene(32, 18)
    assert mk.supports(scene)
    _one_step(scene, cam, 32, 18)


def test_megakernel_image_on_quad():
    """Image textures on quads run in-kernel: parallelogram (alpha, beta)
    uv feeds the one-hot atlas lookup (img_idx overloads the c2.r pack
    row), and supports() no longer falls back."""
    from rrt_tpu.camera import Camera
    from rrt_tpu.scene import SceneBuilder
    b = SceneBuilder()
    rs = np.random.RandomState(3)
    img = rs.uniform(0.05, 0.95, size=(16, 24, 3)).astype(np.float32)
    tex = b.image(img)
    b.quad((-2.0, -1.0, -3.0), (4.0, 0.0, 0.0), (0.0, 2.0, 0.0),
           b.lambertian(tex))
    # A checker quad alongside: checker still reads the real c2.r.
    b.quad((-2.0, -3.5, -3.0), (4.0, 0.0, 0.0), (0.0, 2.0, 0.0),
           b.lambertian(b.checker((0.9, 0.1, 0.1), (0.1, 0.1, 0.9),
                                  scale=4.0)))
    b.sphere((0.0, 2.5, -3.0), 1.0, b.metal((0.8, 0.8, 0.8), 0.1))
    scene = b.build()
    cam = Camera.create(look_from=(0.0, 0.0, 4.0),
                        look_at=(0.0, 0.0, -3.0), fov_deg=60.0,
                        aspect=32.0 / 18.0)
    assert scene.has_images and not scene.has_images_on_media
    assert mk.supports(scene)
    _one_step(scene, cam, 32, 18)


@pytest.mark.slow
def test_megakernel_rttnw_final_supported():
    from rrt_tpu.scenes import rttnw_final_scene
    scene, cam = rttnw_final_scene(32, 18)
    assert mk.supports(scene)  # images only on spheres
    _one_step(scene, cam, 32, 18, n=mk.TN)


def test_megakernel_multi_step():
    """K=3 fused steps must equal three iterated XLA bounce steps
    (dead-lane write-through, bounce counters, per-lane traced counts)."""
    scene, cam = cornell_box_scene(32, 32)
    n = mk.TN
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % 32, (ids // 32) % 32
    keys = rng.sample_keys(jax.random.key(1),
                           (py * 32 + px).astype(jnp.uint32), 0)
    o, d, tm = generate_rays(cam, px, py, 32, 32, keys)

    # XLA reference: iterate the queue driver's bounce update 3 times.
    thr, pend = V3.ones((n,)), V3.zeros((n,))
    alive = jnp.ones((n,), bool)
    bounce = jnp.zeros((n,), jnp.int32)
    traced = jnp.zeros((n,))
    for _ in range(3):
        contrib, o2, d2, att, sv = _shade(scene, o, d, tm, keys, bounce,
                                          alive, 1e-3, 50, packed=None)
        pend = pend + thr * contrib
        thr = V3.where(sv, thr * att, thr)
        bounce = bounce + sv.astype(jnp.int32)
        traced = traced + alive.astype(jnp.float32)
        o, d, alive = o2, d2, sv

    o0, d0, tm0 = generate_rays(cam, px, py, 32, 32, keys)
    st = mk.pack_state(o0, d0, tm0, V3.ones((n,)), V3.zeros((n,)),
                       jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool),
                       jnp.zeros((n,)))
    st2 = mk.bounce_steps(
        st, keys, mk.pack_spheres_full(scene), mk.pack_quads_full(scene),
        mk.pack_media(scene), mk.pack_bg(scene),
        boxes24=mk.pack_boxes_full(scene), k_steps=3,
        moving=scene.has_moving, has_quads=True,
        has_boxes=scene.has_boxes, has_rot_boxes=scene.has_rot_boxes,
        n_media=0, max_depth=50, t_min=1e-3)
    _, _, _, thr2, pend2, bounce2, alive2, traced2 = mk.unpack_state(st2)

    np.testing.assert_array_equal(np.asarray(traced2), np.asarray(traced))
    agree = np.asarray(alive2) == np.asarray(alive)
    assert agree.mean() > 0.98  # near-tie winner flips only
    assert (np.asarray(bounce2) == np.asarray(bounce))[agree].all()
    for got, exp in ((pend2.x, pend.x), (pend2.y, pend.y),
                     (pend2.z, pend.z), (thr2.x, thr.x), (thr2.y, thr.y),
                     (thr2.z, thr.z)):
        close = (np.abs(np.asarray(got) - np.asarray(exp)) < 1e-3)[agree]
        assert close.mean() > 0.97, close.mean()


@pytest.mark.slow
def test_whole_tile_cull_exact():
    """Whole-tile AABB culling must be behavior-preserving: bounce_steps
    with tile bounds produces bit-identical state to bounce_steps
    without them (a cull may only skip tiles no lane can hit)."""
    from rrt_tpu.scenes import rttnw_final_scene
    scene, cam = rttnw_final_scene(32, 18)
    n = mk.TN
    ids = jnp.arange(n, dtype=jnp.int32)
    px, py = ids % 32, (ids // 32) % 18
    keys = rng.sample_keys(jax.random.key(2),
                           (py * 32 + px).astype(jnp.uint32), 0)
    o, d, tm = generate_rays(cam, px, py, 32, 18, keys)
    st = mk.pack_state(o, d, tm, V3.ones((n,)), V3.zeros((n,)),
                       jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool),
                       jnp.zeros((n,)))
    sb = mk.pack_sphere_bounds(scene)
    qb = mk.pack_quad_bounds(scene)
    bb = mk.pack_box_bounds(scene)
    box24 = mk.pack_boxes_full(scene)
    assert scene.n_spheres // mk.TS >= mk.CULL_MIN_TILES
    kw = dict(k_steps=2, moving=scene.has_moving, has_quads=True,
              has_boxes=scene.has_boxes,
              has_rot_boxes=scene.has_rot_boxes,
              has_perlin=scene.has_perlin, has_images=scene.has_images,
              img_ah=scene.images.shape[1], img_aw=scene.images.shape[2],
              n_media=scene.n_media if scene.has_media else 0,
              max_depth=50, t_min=1e-3)
    atlas = mk.pack_atlas(scene)
    ref = mk.bounce_steps(st, keys, mk.pack_spheres_full(scene),
                          mk.pack_quads_full(scene), mk.pack_media(scene),
                          mk.pack_bg(scene), atlas, boxes24=box24, **kw)
    cul = mk.bounce_steps(st, keys, mk.pack_spheres_full(scene),
                          mk.pack_quads_full(scene), mk.pack_media(scene),
                          mk.pack_bg(scene), atlas, sb, qb,
                          boxes24=box24, box_bounds=bb, **kw)
    np.testing.assert_array_equal(np.asarray(cul), np.asarray(ref))


def test_tile_renderer_matches_queue():
    """The one-launch tile-resident renderer (render_image_tiles) agrees
    with the queue driver: identical sample set and keys; differences
    are limited to f32 near-tie winner flips (in-kernel camera math may
    fuse differently than the XLA refill's)."""
    from rrt_tpu.render import (RenderConfig, render_image_queue,
                                render_image_tiles)
    w, h, spp = 64, 32, 4
    for build in (chap12_scene, cornell_box_scene):
        scene, cam = build(w, h)
        cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=8,
                           queue_size=2048)
        iq, nq = render_image_queue(scene, cam, cfg, 0)
        it, nt = render_image_tiles(scene, cam, cfg, 0)
        a, b = np.asarray(iq), np.asarray(it)
        close = np.abs(a - b).max(axis=2) < 1e-3
        assert close.mean() > 0.995, close.mean()
        assert abs(float(nt) - float(nq)) / float(nq) < 5e-3


def test_tile_renderer_chains():
    """chains>1: each lane walks several pixels' sample chains; the
    image must match chains=1 exactly (same keys, same accumulation
    order per pixel)."""
    from rrt_tpu import rng as _rng
    from rrt_tpu.render import RenderConfig
    w, h, spp = 64, 32, 4
    scene, cam = chap12_scene(w, h)
    s0, s1 = _rng._seed_words(jax.random.key(0))
    seed2 = jnp.stack([s0, s1, jnp.uint32(0),
                       jnp.uint32(0)]).astype(jnp.uint32)
    cam24 = mk.pack_camera(cam, w, h)
    sph24 = mk.pack_spheres_full(scene)
    quad24 = jnp.zeros((24, mk.TS), jnp.float32)

    def run(chains):
        meta = mk.pack_pixel_meta(w, h, chains * mk.TN)
        out = mk.render_tiles(meta, seed2, cam24, sph24, quad24,
                              mk.pack_media(scene), mk.pack_bg(scene),
                              None, None, None, spp=spp, chains=chains,
                              moving=False, has_quads=False, n_media=0,
                              max_depth=8, t_min=1e-3)
        return np.asarray(out[0:3, :w * h]), float(out[3].sum())

    r1, n1 = run(1)
    r4, n4 = run(4)
    assert n1 == n4
    np.testing.assert_array_equal(r1, r4)


def test_tile_renderer_ragged_resolution():
    """Resolutions that don't divide the 32x16 pixel rectangles produce
    mixed valid/invalid meta tiles. A lane retires when its *next* chain
    pixel is invalid, so pack_pixel_meta must sort each lane's chain
    sequence valid-first or mid-sequence invalids orphan later valid
    chains (black-rectangle corruption seen at 1200x800, chains=16)."""
    from rrt_tpu import rng as _rng
    from rrt_tpu.render import RenderConfig
    w, h, spp = 72, 40, 2  # gx=3, gy=3: right column + bottom row mixed
    scene, cam = chap12_scene(w, h)
    s0, s1 = _rng._seed_words(jax.random.key(0))
    seed2 = jnp.stack([s0, s1, jnp.uint32(0),
                       jnp.uint32(0)]).astype(jnp.uint32)
    cam24 = mk.pack_camera(cam, w, h)
    sph24 = mk.pack_spheres_full(scene)
    quad24 = jnp.zeros((24, mk.TS), jnp.float32)

    def run(chains):
        meta = mk.pack_pixel_meta(w, h, chains * mk.TN)
        out = mk.render_tiles(meta, seed2, cam24, sph24, quad24,
                              mk.pack_media(scene), mk.pack_bg(scene),
                              None, None, None, spp=spp, chains=chains,
                              moving=False, has_quads=False, n_media=0,
                              max_depth=8, t_min=1e-3)
        out = np.asarray(out)
        gid = np.asarray(meta[2]).astype(np.int64)
        validf = np.asarray(meta[3])
        rad = np.zeros((w * h, 3), np.float32)
        np.add.at(rad, gid, (out[0:3] * validf).T)
        return rad

    r1 = run(1)
    r4 = run(4)
    # chains=1 cannot orphan (one pixel per lane); exact equality means
    # chains=4 rendered every pixel's full sample set too. (A handful of
    # pixels are legitimately black: depth-capped trapped paths.)
    np.testing.assert_array_equal(r1, r4)
    # Cross-check against the queue driver: orphaned chains would show
    # as whole black rectangles and crater the match fraction.
    from rrt_tpu.render import render_image_queue
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=8,
                       queue_size=2048)
    iq, _ = render_image_queue(scene, cam, cfg, 0)
    img4 = (r4 / spp).reshape(h, w, 3)
    close = np.abs(np.asarray(iq) - img4).max(axis=2) < 1e-3
    # At spp=2 one near-tie winner flip moves half a pixel's radiance,
    # so ~1% of pixels differ legitimately; a single orphaned 16x16
    # rectangle would already cost ~9% of the 72x40 image.
    assert close.mean() > 0.98, close.mean()


def test_tile_renderer_sharded_matches_single():
    """The tile driver over a ("dp","sp") mesh equals the single-device
    tile render (global (pixel, sample) keys; dp shards cover disjoint
    pixel blocks; sp splits the sample range)."""
    from rrt_tpu.parallel.mesh import make_mesh, render_image_tiles_sharded
    from rrt_tpu.render import RenderConfig, render_image_tiles
    w, h, spp = 64, 32, 4
    scene, cam = chap12_scene(w, h)
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=8,
                       queue_size=2048)
    single, n1 = render_image_tiles(scene, cam, cfg, 0)
    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2)
    shard, n8 = render_image_tiles_sharded(scene, cam, cfg, 0, mesh)
    np.testing.assert_allclose(np.asarray(shard), np.asarray(single),
                               atol=2e-6)
    assert float(n8) == float(n1)


def test_aabb_far_pad_grazing_rays():
    """The conservative far pad (fp.AABB_T_FAR_PAD, applied in the
    kernel's whole-tile cull — VERDICT r2 weak #5) must rescue every
    grazing-ray false cull: rays aimed exactly at AABB corners round
    tn/tf in f32 such that the unpadded slab test rejects thousands of
    true hits; the padded test may reject none. Mirrors the reference's
    per-axis pad (src/acceleration.rs:78) and uses the same slab
    formulation as megakernel.tile_poss."""
    from rrt_tpu.utils import fp

    rg = np.random.default_rng(0)
    N = 200000
    f32 = np.float32
    mn = rg.uniform(-10, 10, (N, 3)).astype(f32)
    mx = mn + rg.uniform(0.1, 5, (N, 3)).astype(f32)
    corner = np.where(rg.integers(0, 2, (N, 3)).astype(bool), mx, mn)
    o = rg.uniform(-30, 30, (N, 3)).astype(f32)
    d = (corner - o).astype(f32)  # grazes the corner exactly
    inv = f32(1.0) / d
    t1 = (mn - o) * inv
    t2 = (mx - o) * inv
    tn = np.minimum(t1, t2).max(1)
    tf = np.maximum(t1, t2).min(1)
    # exact (f64) slab verdicts
    o64, d64 = o.astype(np.float64), d.astype(np.float64)
    t1e = (mn.astype(np.float64) - o64) / d64
    t2e = (mx.astype(np.float64) - o64) / d64
    true_hit = np.minimum(t1e, t2e).max(1) <= np.maximum(t1e, t2e).min(1)
    unpadded_cull = true_hit & ~(tn <= tf)
    padded_cull = true_hit & ~(tn <= tf * f32(fp.AABB_T_FAR_PAD))
    assert unpadded_cull.sum() > 1000  # the pad is load-bearing
    assert padded_cull.sum() == 0


def test_sphere_pack_tail_columns_strictly_invalid():
    """Family-size padding must pack r2 = -1 in the tail columns, not 0:
    a zero-padded slot (radius-0 sphere at the world origin) has
    disc <= 0 only in exact arithmetic — f32 cancellation in
    half_b^2 - a*c can flip disc positive for rays nearly collinear
    with the origin, yielding phantom hits shaded from all-zero
    material rows (ADVICE r3 medium). The pad branch fires when the
    scene's 128-padded count is not a TS multiple: 260 spheres pad to
    384 rows in SceneArrays, then to the 512-wide family target here."""
    from rrt_tpu.scene import SceneBuilder

    b = SceneBuilder()
    rg = np.random.default_rng(7)
    grey = b.lambertian((0.5, 0.5, 0.5))
    for i in range(260):
        b.sphere(rg.uniform(-50, 50, 3), 0.5, grey)
    scene = b.build()
    s = scene.sphere_radius.shape[0]
    mat = np.asarray(mk.pack_spheres_full(scene))
    assert mat.shape[1] > s  # the jnp.pad tail is actually present
    # every invalid slot (declared or pad) carries the -1 margin
    valid = np.asarray(scene.sphere_valid)
    assert (mat[3, :s][~valid] == -1.0).all()
    assert (mat[3, s:] == -1.0).all()
    # and the margin survives the kernel's candidate test for a grazing
    # ray exactly collinear with the origin: with r2=0 the f32 disc
    # cancels to exactly 0 (a phantom t=0-ish hit window), with r2=-1 it
    # stays strictly negative as long as |o|^2 < 2^23 (f32 spacing < 1,
    # i.e. coordinates within ~2900 units — ample for the books' scenes).
    half_b = np.float32(-2000.0)  # o=(2000,0,0), d=(-1,0,0)
    a = np.float32(1.0)
    o_sq = np.float32(4e6)
    disc_zero = half_b * half_b - a * (o_sq - np.float32(0.0))
    disc_pad = half_b * half_b - a * (o_sq - mat[3, -1])
    assert disc_zero >= 0  # r2=0 padding admits the degenerate window
    assert disc_pad < 0  # r2=-1 padding keeps the strict margin
