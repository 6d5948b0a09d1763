"""North-star training step: chap12 1200x800 @ 500 spp, end to end.

Measures the production make_train_step path (auto-routes to the
chunked trainer above 256 spp) — the metric BASELINE.md's "North-star
training" section tracks (reference analog: the full `tracescene`
render of /root/reference/src/lib.rs:73-111, which has no backward).

Usage:
  python benchmarks/north_star.py [--spp 500] [--rr-depth 0]
      [--chunk 0] [--iters 2]

--rr-depth N: Russian roulette past bounce N on BOTH the forward
chunks and the backward replays (round 4: the differentiable paths
honor rr with a replayed kill + detached 1/p weight). The estimator
changes (variance, not mean); the A/B at equal spp is the wall-time
lever measured here.
"""

import argparse
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=500)
    ap.add_argument("--rr-depth", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=0,
                    help="spp per chunk (0 = auto)")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--height", type=int, default=800)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rrt_tpu.diff import (make_train_step, make_train_step_chunked,
                              resolve_spp_chunk)
    from rrt_tpu.render import RenderConfig
    from rrt_tpu.scenes import chap12_scene

    cfg = RenderConfig(width=args.width, height=args.height,
                       spp=args.spp, max_depth=50,
                       rr_depth=args.rr_depth)
    scene, cam = chap12_scene(cfg.width, cfg.height)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    if args.chunk:
        # Explicit chunk: drive the chunked trainer directly. The
        # effective chunk may differ (scene-safe cap + largest divisor
        # of spp).
        step = make_train_step_chunked(cfg, spp_chunk=args.chunk)
        eff_chunk = resolve_spp_chunk(cfg, args.chunk, scene)
    else:
        # Production path: make_train_step routes spp <= 256 one-shot
        # and bigger budgets through the chunked trainer (auto chunk).
        step = make_train_step(cfg)
        eff_chunk = (resolve_spp_chunk(cfg, scene=scene)
                     if cfg.spp > 256 else "one-shot")

    def sync(out):
        jax.block_until_ready(out)
        float(out[2])
        return out

    print("compiling + warming (first step)...", flush=True)
    t0 = time.time()
    out = sync(step(scene, cam, target, 0))
    print(f"first step (incl. compile): {time.time() - t0:.1f} s, "
          f"loss {float(out[2]):.6f}", flush=True)

    ts = []
    for i in range(args.iters):
        t0 = time.time()
        out = sync(step(scene, cam, target, 0))
        ts.append(time.time() - t0)
        print(f"iter {i}: {ts[-1]:.1f} s", flush=True)
    med = statistics.median(ts)
    rays = cfg.width * cfg.height * cfg.spp  # primary; traced >> this
    print(f"median train step: {med:.1f} s over {args.iters} iters "
          f"(spread [{min(ts):.1f}, {max(ts):.1f}]); "
          f"{rays / med / 1e6:.1f} Mprimary-rays/s fwd+bwd; "
          f"rr_depth={args.rr_depth} chunk={eff_chunk}")


if __name__ == "__main__":
    main()
