"""Sweep the megakernel tile shape knobs (RRT_TN / RRT_TS env) over the
bench scenes on the real TPU.

Run under each knob setting separately (the knobs are read at import
time), e.g.:

    RRT_TS=128 python benchmarks/tile_sweep.py chap12 rttnw_final

Prints per-scene median Mrays/s (median of N_ITERS hard-synced
iterations, same contract as bench.py). Used to produce the TN/TS
tables in BASELINE.md.
"""

import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin

import jax  # noqa: E402

from rrt_tpu.render import RenderConfig, render_image_tiles  # noqa: E402
from rrt_tpu.scenes import SCENES  # noqa: E402
from rrt_tpu.ops import megakernel as mk  # noqa: E402

N_ITERS = 5
CONFIGS = {
    "chap12": (1200, 800),
    "cornell": (400, 400),
    "rttnw_final": (400, 267),
}


def main(names):
    print(f"TN={mk.TN} TS={mk.TS}")
    for name in names:
        w, h = CONFIGS[name]
        scene, cam = SCENES[name](w, h)
        cfg = RenderConfig(width=w, height=h, spp=32, max_depth=50,
                           use_megakernel=True)

        def run():
            img, n = render_image_tiles(scene, cam, cfg, 0)
            float(img[0, 0, 0])  # hard sync through the tunnel runtime
            return float(n)

        nrays = run()  # compile + warm
        run()
        ts = []
        for _ in range(N_ITERS):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        print(f"{name:16s} {nrays / med / 1e6:7.1f} Mrays/s"
              f"  (median {med:.3f} s, spread [{min(ts):.3f},"
              f" {max(ts):.3f}])", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or list(CONFIGS)))
