"""Scaling-efficiency harness (SURVEY.md §4 item 5, north-star >= 85%).

Measures rays/s of the sharded renderer at 1, 2, 4, ... devices with the
per-device workload held constant (weak scaling over the spp axis) and
with the total workload held constant (strong scaling over tiles).

On real hardware this runs across chips/hosts; with
--xla_force_host_platform_device_count it validates the sharding logic on
virtual CPU devices (reported efficiency there reflects host contention,
not ICI)."""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=144)
    ap.add_argument("--spp", type=int, default=16)
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")

    import rrt_tpu
    from rrt_tpu.parallel.mesh import make_mesh, render_image_sharded
    from rrt_tpu.scenes import chap12_scene

    n_dev = len(jax.devices())
    if args.devices:
        n_dev = min(n_dev, args.devices)
    cfg = rrt_tpu.RenderConfig(
        width=args.width, height=args.height, spp=args.spp, max_depth=50,
        tile_pixels=4096, samples_per_pass=2)
    scene, cam = chap12_scene(cfg.width, cfg.height)

    results = {}
    n = 1
    while n <= n_dev:
        mesh = make_mesh(devices=jax.devices()[:n], sp=1)
        img, nt = render_image_sharded(scene, cam, cfg, 0, mesh)
        img.block_until_ready()
        t0 = time.time()
        img, nt = render_image_sharded(scene, cam, cfg, 0, mesh)
        img.block_until_ready()
        dt = time.time() - t0
        rays = float(nt)
        results[n] = rays / dt
        eff = results[n] / (results[1] * n) if 1 in results else 1.0
        print(f"devices={n}: {rays / dt / 1e6:.2f} Mrays/s  "
              f"efficiency={eff:.1%}", flush=True)
        n *= 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
