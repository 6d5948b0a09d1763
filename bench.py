"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric (BASELINE.json): Mrays/s/chip fwd+bwd on the RTIOW final scene
(chap12). Forward is the compacted-queue renderer at 1200x800; backward is
the rematerialized scan path on a representative tile batch. The combined
number is total rays traced (fwd pass + fwd-of-bwd replay) / wall time.

The reference publishes no numbers (SURVEY.md §6), so vs_baseline is
reported against the baseline recorded in BASELINE.md (1.0 when this run
*is* the baseline).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp


def main():
    import rrt_tpu
    from rrt_tpu import rng
    from rrt_tpu.camera import generate_rays
    from rrt_tpu.render import (RenderConfig, render_image_queue,
                                trace_batch)
    from rrt_tpu.scenes import chap12_scene

    width, height, spp = 1200, 800, 8
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=50,
                       queue_size=131072, bounces_per_refill=4,
                       use_megakernel=True)
    scene, cam = chap12_scene(width, height)

    # --- forward: full image through the queue driver -------------------
    for _ in range(2):  # warm: compile + first dispatch, hard-synced
        img, n_fwd = render_image_queue(scene, cam, cfg, 0)
        _ = float(img[0, 0, 0])
    t0 = time.time()
    img, n_fwd = render_image_queue(scene, cam, cfg, 0)
    _ = float(img[0, 0, 0])  # hard sync (block_until_ready can be lazy
    # through the tunnel runtime)
    fwd_s = time.time() - t0
    fwd_rays = float(n_fwd)

    # --- backward: grad of an MSE loss through the scan path ------------
    from rrt_tpu.diff import partition, combine

    n_tile = 65536
    ids = jnp.arange(n_tile, dtype=jnp.int32) * (width * height // 65536)
    px, py = ids % width, (ids // width) % height
    gid = (py * width + px).astype(jnp.uint32)
    keys = rng.sample_keys(jax.random.key(0), gid, 0)
    bwd_depth = 16

    def loss_fn(params):
        s = combine(scene, params)
        o, d, tm = generate_rays(cam, px, py, width, height, keys)
        rad, n = trace_batch(s, o, d, tm, keys, bwd_depth, 1e-3,
                             differentiable=True)
        return (jnp.mean(rad.x) + jnp.mean(rad.y) + jnp.mean(rad.z)), n

    grad_fn = jax.jit(jax.grad(lambda p: loss_fn(p)[0]))
    count_fn = jax.jit(lambda p: loss_fn(p)[1])
    params = partition(scene)
    g = grad_fn(params)
    jax.block_until_ready(g)  # compile
    n_bwd_rays = float(count_fn(params))
    t0 = time.time()
    g = grad_fn(params)
    jax.block_until_ready(g)
    bwd_s = time.time() - t0

    # fwd+bwd Mrays/s: rays traced in forward plus the backward's
    # forward-replay rays, over the combined wall time.
    total_rays = fwd_rays + 2.0 * n_bwd_rays  # bwd = fwd trace + replay
    total_s = fwd_s + bwd_s
    mrays = total_rays / total_s / 1e6

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE.md")) as f:
            for line in f:
                if line.startswith("fwd_bwd_mrays_per_s:"):
                    baseline = float(line.split(":")[1])
    except FileNotFoundError:
        pass
    vs = (mrays / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": "fwd+bwd Mrays/s/chip (chap12 1200x800)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "fwd_mrays_per_s": round(fwd_rays / fwd_s / 1e6, 2),
            "fwd_s": round(fwd_s, 2),
            "bwd_s": round(bwd_s, 2),
            "fwd_rays": fwd_rays,
            "bwd_rays": n_bwd_rays,
            "backend": jax.default_backend(),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
