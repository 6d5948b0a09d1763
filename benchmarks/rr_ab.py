"""Russian-roulette A/B on the tile driver (VERDICT r3 #7).

For each headline scene, renders the full image with rr_depth in
{0 (off), 4, 8} and reports wall time, Mrays/s, traced rays, and the
mean-abs image difference vs the exact-termination render (the
golden-style visual tolerance — RR is unbiased, so the diff is pure
Monte-Carlo variance; the adopt/reject call compares wall-time savings
against that noise at equal spp).

Run on the real chip: python benchmarks/rr_ab.py
"""

import dataclasses
import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rrt_tpu.render import RenderConfig, render_image_tiles
    from rrt_tpu.scenes import (book2chap2_scene, chap12_scene,
                                rttnw_final_scene)

    def sync(out):
        img, n = out
        float(img[0, 0, 0])
        return out

    def timed(fn, n=3):
        sync(fn())
        ts = []
        for _ in range(n):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        return statistics.median(ts)

    jax.block_until_ready(jnp.zeros(8) + 1.0)
    results = {}
    for name, builder, (w, h) in (
            ("chap12", chap12_scene, (1200, 800)),
            ("book2chap2", book2chap2_scene, (1200, 800)),
            ("rttnw_final", rttnw_final_scene, (400, 267))):
        scene, cam = builder(w, h)
        base = RenderConfig(width=w, height=h, spp=32, max_depth=50,
                            use_megakernel=True)
        row = {}
        img0 = None
        for rr in (0, 4, 8):
            cfg = dataclasses.replace(base, rr_depth=rr)

            def fn(cfg=cfg):
                return render_image_tiles(scene, cam, cfg, 0)

            img, n = sync(fn())
            med = timed(fn)
            key = f"rr{rr}"
            row[key] = {
                "wall_s": round(med, 4),
                "mrays_per_s": round(float(n) / med / 1e6, 2),
                "traced_mrays": round(float(n) / 1e6, 2),
            }
            a = np.asarray(img)
            if rr == 0:
                img0 = a
                row[key]["img_mean"] = round(float(a.mean()), 5)
            else:
                row[key]["meandiff_vs_rr0"] = round(
                    float(np.abs(a - img0).mean()), 6)
                row[key]["relmeandiff"] = round(
                    float(np.abs(a - img0).mean() / max(img0.mean(),
                                                        1e-9)), 5)
                row[key]["speedup_vs_rr0"] = round(
                    row["rr0"]["wall_s"] / med, 3)
        results[name] = row
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
