"""Per-feature step-cost attribution for the RTTNW final scene.

The tile kernel is branchless: the earth-image atlas contraction, the
7-octave perlin turbulence, the media interval sampling and every
primitive family run for ALL lanes every step, whether or not any lane
needs them. This script builds the scene with each feature removed —
via rttnw_final_scene's `ablate` parameter, so there is exactly ONE
copy of the scene construction — and reports Mrays/s + us/step,
attributing the fixed per-step budget. Findings recorded in BASELINE.md
("Large-scene push").

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/rttnw_ablation.py
"""

import os
import statistics
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax

from rrt_tpu.render import RenderConfig, tile_call, tile_chains
from rrt_tpu.scenes import rttnw_final_scene
from rrt_tpu.ops import megakernel as mk

W, H, SPP = 400, 267, 32


def measure(name, ablate=frozenset()):
    scene, cam = rttnw_final_scene(W, H, ablate=frozenset(ablate))
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
    for feat in ("earth", "perlin", "media", "boxes", "cloud"):
        measure(f"no_{feat}", {feat})
    measure("bare(sph-only)", {"earth", "perlin", "media", "boxes"})
    return 0


if __name__ == "__main__":
    sys.exit(main())
