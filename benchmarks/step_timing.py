"""Per-step timing of the tile-resident megakernel: wall time, actual
while-loop trip counts (out row 4), lane utilization, and Mrays/s, per
scene. Used with the RRT_SELP / RRT_TN / RRT_TS knobs to decompose the
bounce-step budget on real hardware.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/step_timing.py chap12
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
import jax.numpy as jnp

from rrt_tpu.render import RenderConfig, tile_call, tile_chains
from rrt_tpu.scenes import SCENES
from rrt_tpu.ops import megakernel as mk

N_ITERS = 5
CONFIGS = {
    "chap12": (1200, 800),
    "cornell": (400, 400),
    "rttnw_final": (400, 267),
    "book2chap2": (1200, 800),
    "cornell_smoke": (400, 400),
}


def main(names):
    print(f"TN={mk.TN} TS={mk.TS} "
          f"SELP={os.environ.get('RRT_SELP') or 'exact-split'}")
    for name in names:
        w, h = CONFIGS[name]
        scene, cam = SCENES[name](w, h)
        cfg = RenderConfig(width=w, height=h, spp=32, max_depth=50,
                           use_megakernel=True)
        chains = tile_chains(cfg, scene)
        meta = mk.pack_pixel_meta(w, h, chains * mk.TN)

        run = jax.jit(lambda: tile_call(scene, cam, cfg, 0, meta, chains,
                                        0, cfg.spp))

        out = run()
        float(out[0, 0])  # compile + warm
        block = chains * mk.TN
        n_inst = meta.shape[1] // block
        ksteps = out[4].reshape(n_inst, block)[:, 0]
        total_steps = float(jnp.sum(ksteps))
        rays = float(jnp.sum(out[3]))
        ts = []
        for _ in range(N_ITERS):
            t0 = time.time()
            o = run()
            float(o[0, 0])
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        util = rays / (total_steps * mk.TN)
        print(f"{name:13s} {rays / med / 1e6:6.1f} Mrays/s | "
              f"{total_steps:9.0f} steps | {med / total_steps * 1e9:7.0f}"
              f" ns/step | util {util:.3f} | wall {med:.3f} s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or list(CONFIGS)))
