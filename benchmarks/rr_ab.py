"""Russian-roulette A/B on the tile driver (VERDICT r3 #7, r4 #6).

Default mode: for each headline scene, renders the full image with
rr_depth in {0 (off), 4, 8} and reports wall time, Mrays/s, traced
rays, and the mean-abs image difference vs the exact-termination render
(the golden-style visual tolerance — RR is unbiased, so the diff is
pure Monte-Carlo variance; the adopt/reject call compares wall-time
savings against that noise at equal spp).

--curve mode (VERDICT r4 next #6): the defensible quality claim — an
error-vs-wall curve against a CONVERGED golden (4100 spp, exact
termination, independent seed) for chap12 and rttnw_final: per
rr_depth in {0, 4, 8}, the 32-spp render's wall time and its MSE vs
the golden. RR is unbiased, so MSE at equal spp should match the exact
render's within Monte-Carlo noise while the wall drops — making
seconds-per-image-AT-MATCHED-ERROR the official rttnw metric
(BASELINE.md "Russian roulette: error vs wall").

Run on the real chip: python benchmarks/rr_ab.py [--curve]
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
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    """Hard device sync (block_until_ready can be lazy through the
    tunnel runtime — verify SKILL.md)."""
    img, n = out
    float(img[0, 0, 0])
    return out


def timed(fn, n=3):
    """Warm + median of n (one helper for BOTH modes, so the timing
    discipline cannot drift between them)."""
    sync(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    from rrt_tpu.render import RenderConfig, render_image_tiles
    from rrt_tpu.scenes import (book2chap2_scene, chap12_scene,
                                rttnw_final_scene)

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


def curve():
    """Error-vs-wall vs a converged golden (VERDICT r4 next #6)."""
    from rrt_tpu.render import (RenderConfig, render_image_tiles,
                                trace_tiles)
    from rrt_tpu.scenes import chap12_scene, rttnw_final_scene

    GOLDEN_SPP, CHUNK = 4100, 100  # 41 x 100-spp chunks: each device
    # call stays far inside the ~60 s execution window, and the
    # 100-spp tile variant is the CLI's default chunk (warm cache).

    jax.block_until_ready(jnp.zeros(8) + 1.0)
    results = {}
    for name, builder, (w, h) in (
            ("chap12", chap12_scene, (1200, 800)),
            ("rttnw_final", rttnw_final_scene, (400, 267))):
        scene, cam = builder(w, h)
        cfg_g = RenderConfig(width=w, height=h, spp=GOLDEN_SPP,
                             max_depth=50, use_megakernel=True)
        t0 = time.time()
        acc = None
        for lo in range(0, GOLDEN_SPP, CHUNK):
            r, _ = trace_tiles(scene, cam, cfg_g, 0, sample_lo=lo,
                               n_samples=CHUNK)
            r = np.asarray(r)  # sync + keep accumulation on host
            acc = r if acc is None else acc + r
        golden = (acc / GOLDEN_SPP).reshape(h, w, 3)
        row = {"golden_spp": GOLDEN_SPP,
               "golden_wall_s": round(time.time() - t0, 1)}
        base = RenderConfig(width=w, height=h, spp=32, max_depth=50,
                            use_megakernel=True)
        for rr in (0, 4, 8):
            cfg = dataclasses.replace(base, rr_depth=rr)

            def fn(cfg=cfg):
                # seed 7: independent of the golden's sample set, so
                # the MSE estimates the render's own variance without
                # shared-sample correlation.
                return render_image_tiles(scene, cam, cfg, 7)

            img, n = sync(fn())
            med = timed(fn)
            mse = float(((np.asarray(img) - golden) ** 2).mean())
            row[f"rr{rr}"] = {
                "spp": 32, "wall_s": round(med, 4),
                "mse_vs_golden": round(mse, 8),
                "traced_mrays": round(float(n) / 1e6, 2),
            }
        for rr in (4, 8):
            row[f"rr{rr}"]["mse_ratio_vs_rr0"] = round(
                row[f"rr{rr}"]["mse_vs_golden"]
                / row["rr0"]["mse_vs_golden"], 4)
            row[f"rr{rr}"]["speedup_vs_rr0"] = round(
                row["rr0"]["wall_s"] / row[f"rr{rr}"]["wall_s"], 3)
            # seconds-per-image at matched error: RR is unbiased, so
            # MSE ~ variance/spp; scale the rr wall by the spp factor
            # that would equalize MSE with the exact render's.
            row[f"rr{rr}"]["matched_error_wall_s"] = round(
                row[f"rr{rr}"]["wall_s"]
                * row[f"rr{rr}"]["mse_ratio_vs_rr0"], 4)
            row[f"rr{rr}"]["matched_error_speedup"] = round(
                row["rr0"]["wall_s"]
                / row[f"rr{rr}"]["matched_error_wall_s"], 3)
        results[name] = row
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--curve" in sys.argv:
        curve()
    else:
        main()
