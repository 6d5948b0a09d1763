"""Per-feature step-cost attribution for the RTTNW final scene.

The tile kernel is branchless: the earth-image atlas contraction, the
7-octave perlin turbulence, the media interval sampling and every
primitive family run for ALL lanes every step, whether or not any lane
needs them. This script rebuilds the scene with each feature removed
(statically, via the has_* flags that drop the code entirely) and
reports us/step, attributing the fixed per-step budget.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/rttnw_ablation.py
"""

import math
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import numpy as np
import jax

from rrt_tpu.camera import Camera
from rrt_tpu.render import RenderConfig, tile_call, tile_chains
from rrt_tpu.scene import SceneBuilder
from rrt_tpu.ops import megakernel as mk

W, H, SPP = 400, 267, 32


def build(no_earth=False, no_perlin=False, no_media=False,
          no_boxes=False, no_cloud=False, seed=0):
    from rrt_tpu.scenes.book2 import _default_earth_image
    rs = np.random.RandomState(seed)
    b = SceneBuilder()
    b.solid_background((0.0, 0.0, 0.0))
    ground = b.lambertian((0.48, 0.83, 0.53))
    for i in range(20):
        for j in range(20):
            w = 100.0
            x0, z0 = -1000.0 + i * w, -1000.0 + j * w
            y1 = float(rs.uniform(1.0, 101.0))
            if no_boxes:
                continue
            b.box((x0, 0.0, z0), (x0 + w, y1, z0 + w), ground)
    light = b.diffuse_light((7.0, 7.0, 7.0))
    b.quad((123.0, 554.0, 147.0), (300.0, 0.0, 0.0), (0.0, 0.0, 265.0),
           light)
    b.moving_sphere((400.0, 400.0, 200.0), (430.0, 400.0, 200.0), 0.0,
                    1.0, 50.0, b.lambertian((0.7, 0.3, 0.1)))
    glass = b.dielectric(1.5)
    b.sphere((260.0, 150.0, 45.0), 50.0, glass)
    b.sphere((0.0, 150.0, 145.0), 50.0, b.metal((0.8, 0.8, 0.9), fuzz=1.0))
    b.sphere((360.0, 150.0, 145.0), 70.0, glass)
    if not no_media:
        b.medium_sphere((360.0, 150.0, 145.0), 70.0, density=0.2,
                        albedo=(0.2, 0.4, 0.9))
        b.medium_sphere((0.0, 0.0, 0.0), 5000.0, density=1.0e-4,
                        albedo=(1.0, 1.0, 1.0))
    tex = (b.lambertian((0.4, 0.3, 0.2)) if no_earth
           else b.lambertian(b.image(_default_earth_image())))
    b.sphere((400.0, 200.0, 400.0), 100.0, tex)
    per = (b.lambertian((0.5, 0.5, 0.5)) if no_perlin
           else b.lambertian(b.perlin(scale=0.1)))
    b.sphere((220.0, 280.0, 300.0), 80.0, per)
    white = b.lambertian((0.73, 0.73, 0.73))
    ang = math.radians(15.0)
    c, s = math.cos(ang), math.sin(ang)
    for _ in range(1000):
        x, y, z = rs.uniform(0.0, 165.0, size=3)
        if no_cloud:
            continue
        rx = c * x + s * z - 100.0
        rz = -s * x + c * z + 395.0
        b.sphere((float(rx), float(y + 270.0), float(rz)), 10.0, white)
    cam = Camera.create(look_from=(478.0, 278.0, -600.0),
                        look_at=(278.0, 278.0, 0.0), fov_deg=40.0,
                        aspect=W / H, time0=0.0, time1=1.0)
    return b.build(spatial_sort=True), cam


def measure(name, **kw):
    scene, cam = build(**kw)
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=50,
                       use_megakernel=True)
    chains = tile_chains(cfg, scene)
    meta = mk.pack_pixel_meta(W, H, chains * mk.TN)
    run = jax.jit(lambda: tile_call(scene, cam, cfg, 0, meta, chains, 0,
                                    cfg.spp))
    out = run()
    float(out[0, 0])
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = run()
        float(out[0, 0])
        ts.append(time.time() - t0)
    dt = statistics.median(ts)
    steps = float(out[4, 0])
    rays = float(out[3].sum())
    print(f"{name:18s} {dt:7.3f}s  steps={steps:7.0f}  "
          f"{dt / steps * 1e6:6.2f} us/step  "
          f"{rays / dt / 1e6:6.1f} Mrays/s  fam_n={scene.fam_n}",
          flush=True)
    return dt / steps


def main():
    measure("full")
    measure("no_earth", no_earth=True)
    measure("no_perlin", no_perlin=True)
    measure("no_media", no_media=True)
    measure("no_boxes", no_boxes=True)
    measure("no_cloud", no_cloud=True)
    measure("bare(sph-only)", no_earth=True, no_perlin=True,
            no_media=True, no_boxes=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
