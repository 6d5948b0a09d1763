"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric (BASELINE.json): Mrays/s/chip fwd+bwd on the RTIOW final scene
(chap12). Forward is the compacted-queue renderer at 1200x800; backward
is the fused custom_vjp train step (ops.megakernel_vjp) at full depth
50 on a 262k-ray batch. The combined number is total rays traced
(fwd pass + backward's replay, counted 2x for replay+adjoint) over the
combined median wall time.

Statistical contract (VERDICT r1 #7, mirroring the role of the
reference's criterion harness /root/reference/benches/benchmark.rs:38-42):
every timing is the median of N_ITERS post-warmup iterations with the
min/max spread reported, and scene construction is timed separately
(the analog of the reference's `chap12_scene` bench,
benches/benchmark.rs:29-36).

vs_baseline compares against the round-1 record in BASELINE.md (12.9).
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp

N_ITERS = 5


def _timed(fn, sync, n=None):
    """Median + spread of n (default N_ITERS) runs of fn()."""
    ts = []
    for _ in range(n or N_ITERS):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return statistics.median(ts), min(ts), max(ts)


def main():
    import rrt_tpu
    from rrt_tpu import rng
    from rrt_tpu.camera import generate_rays
    from rrt_tpu.diff import combine, partition
    from rrt_tpu.render import (RenderConfig, render_image_queue,
                                render_image_tiles, trace_batch)
    from rrt_tpu.scenes import chap12_scene

    # 32spp per launch: the north-star config is 500spp, and per-launch
    # sample count amortizes the tile driver's straggler tail (45.5
    # Mrays/s at 8spp vs ~62 at 100spp on the same scene); 32 keeps the
    # bench fast while being representative.
    width, height, spp = 1200, 800, 32
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=50,
                       queue_size=131072, bounces_per_refill=4,
                       use_megakernel=True)

    # --- scene construction (host) --------------------------------------
    # Warm the backend first: the first jax op of the process pays TPU
    # tunnel/backend initialization (~60 s), which is not scene-build cost.
    jax.block_until_ready(jnp.zeros(8) + 1.0)
    t0 = time.time()
    scene, cam = chap12_scene(width, height)
    jax.block_until_ready(scene.sphere_c0)
    build_s = time.time() - t0

    # --- forward: full image through the tile-resident megakernel -------
    def fwd():
        return render_image_tiles(scene, cam, cfg, 0)

    def fwd_q():
        return render_image_queue(scene, cam, cfg, 0)

    def sync_img(out):
        img, n = out
        float(img[0, 0, 0])  # hard sync (block_until_ready can be lazy
        return out           # through the tunnel runtime)

    img, n_fwd = sync_img(fwd())  # compile + warm
    sync_img(fwd())
    fwd_rays = float(n_fwd)
    fwd_med, fwd_min, fwd_max = _timed(fwd, sync_img)
    sync_img(fwd_q())  # compile + warm
    q_med, _, _ = _timed(fwd_q, sync_img)

    # --- scene coverage: the other BASELINE scenes through the tile
    # driver (the headline stays chap12 for round-over-round
    # comparability; these ride along as detail fields).
    from rrt_tpu.scenes import cornell_box_scene, rttnw_final_scene
    scene_extras = {}
    for name, builder, (w2, h2) in (
            ("cornell", cornell_box_scene, (400, 400)),
            ("rttnw_final", rttnw_final_scene, (400, 267))):
        sc, cm = builder(w2, h2)
        cfg2 = RenderConfig(width=w2, height=h2, spp=32, max_depth=50,
                            use_megakernel=True)

        def fwd2(sc=sc, cm=cm, cfg2=cfg2):
            return render_image_tiles(sc, cm, cfg2, 0)

        _, n2 = sync_img(fwd2())  # compile + warm
        med2, _, _ = _timed(fwd2, sync_img, n=3)
        scene_extras[name + "_mrays_per_s"] = round(
            float(n2) / med2 / 1e6, 2)

    # --- backward: fused custom_vjp chain path, full depth 50 -----------
    # 262k lanes, the round-1/2 headline config (kept verbatim so
    # vs_baseline tracks real movement). Measured r3: the chain path is
    # ~6.1 Mrays/s nearly flat from 262k to 1M lanes (0.137 s -> 0.470 s)
    # — per-launch costs are ~10%, NOT dominant; the 8x gap to the tile
    # train backward (48.8 Mrays/s) is dead-lane waste inherent to
    # fixed-batch chains at depth 50. Full-image gradients ride the tile
    # train path (train_bwd_8spp_s / bwd_tile_mrays_per_s fields).
    n_tile = 262144
    ids = jnp.arange(n_tile, dtype=jnp.int32) * (width * height // n_tile)
    px, py = ids % width, (ids // width) % height
    gid = (py * width + px).astype(jnp.uint32)
    keys = rng.sample_keys(jax.random.key(0), gid, 0)
    bwd_depth = cfg.max_depth

    def loss_fn(params):
        s = combine(scene, params)
        o, d, tm = generate_rays(cam, px, py, width, height, keys)
        rad, n = trace_batch(s, o, d, tm, keys, bwd_depth, 1e-3,
                             differentiable=True, fused_vjp=True)
        return (jnp.mean(rad.x) + jnp.mean(rad.y) + jnp.mean(rad.z)), n

    grad_fn = jax.jit(jax.grad(lambda p: loss_fn(p)[0]))
    count_fn = jax.jit(lambda p: loss_fn(p)[1])
    params = partition(scene)

    def sync_tree(g):
        jax.block_until_ready(g)
        float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
        return g

    # Warm through sync_tree, not bare block_until_ready: the helper's
    # first float() compiles three tiny jits (ravel/dynamic_slice/
    # squeeze) which otherwise land INSIDE the timed window — the
    # [0.126, 7.239] bwd spread outlier of BENCH_r02.
    sync_tree(grad_fn(params))  # compile + warm (incl. sync helper)
    n_bwd_rays = float(count_fn(params))

    bwd_med, bwd_min, bwd_max = _timed(lambda: grad_fn(params), sync_tree)

    # --- fused tile train step: full image at 8spp, depth 50 ------------
    # (ops.megakernel_train: one spill-forward launch + one segmented
    # replay+adjoint launch; the round-3 answer to "train at queue
    # speed". Reported as its own fields — the headline keeps its
    # round-1 definition for comparability.)
    from rrt_tpu.render import trace_tiles, trace_tiles_diff
    cfg8 = RenderConfig(width=width, height=height, spp=8, max_depth=50)

    def train_loss(p):
        s = combine(scene, p)
        rad, n = trace_tiles_diff(s, cam, cfg8, 0)
        return jnp.mean(rad), n

    train_grad = jax.jit(jax.grad(lambda p: train_loss(p)[0]))
    # custom_vjp primal = the spill-augmented forward launch alone:
    # train - spill isolates the one segmented replay+adjoint launch.
    fwd_spill = jax.jit(lambda p: train_loss(p)[0])
    fwd8 = jax.jit(lambda: trace_tiles(scene, cam, cfg8, 0))
    sync_tree(train_grad(params))
    sync_tree(fwd_spill(params))
    sync_tree(fwd8())
    n_train_rays = float(jax.jit(lambda p: train_loss(p)[1])(params))
    train_med, _, _ = _timed(lambda: train_grad(params), sync_tree, n=3)
    spill_med, _, _ = _timed(lambda: fwd_spill(params), sync_tree, n=3)
    fwd8_med, _, _ = _timed(fwd8, sync_tree, n=3)
    # floor: both medians are n=3 and independently noisy; a jitter
    # inversion must not emit a negative/inf backward field.
    bwd_tile_s = max(train_med - spill_med, 1e-6)

    # --- sharded fused train step, (dp=1, sp=1) mesh ---------------------
    # (single chip here; proves the shard_map train path compiles and
    # runs on hardware — efficiency at N needs N chips.)
    from rrt_tpu.diff import make_train_step
    from rrt_tpu.parallel.mesh import make_mesh
    mesh1 = make_mesh(devices=jax.devices()[:1], dp=1, sp=1)
    target = jnp.zeros((height, width, 3), jnp.float32)
    step1 = make_train_step(cfg8, mesh=mesh1)
    sync_tree(step1(scene, cam, target, 0))
    tr_sh_med, _, _ = _timed(lambda: step1(scene, cam, target, 0),
                             sync_tree, n=3)

    # fwd+bwd Mrays/s: rays traced in forward plus the backward's
    # replay+adjoint rays, over the combined median wall time.
    total_rays = fwd_rays + 2.0 * n_bwd_rays
    mrays = total_rays / (fwd_med + bwd_med) / 1e6

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
            "iters": N_ITERS,
            "fwd_mrays_per_s": round(fwd_rays / fwd_med / 1e6, 2),
            "fwd_queue_mrays_per_s": round(fwd_rays / q_med / 1e6, 2),
            "fwd_s_median": round(fwd_med, 3),
            "fwd_s_spread": [round(fwd_min, 3), round(fwd_max, 3)],
            "bwd_alone_mrays_per_s": round(n_bwd_rays / bwd_med / 1e6, 2),
            "bwd_depth": bwd_depth,
            "bwd_step_s_median": round(bwd_med, 3),
            "bwd_s_spread": [round(bwd_min, 3), round(bwd_max, 3)],
            "train_step_8spp_s": round(train_med, 3),
            "train_fwd_8spp_s": round(fwd8_med, 3),
            "train_fwd_spill_8spp_s": round(spill_med, 3),
            "train_bwd_8spp_s": round(bwd_tile_s, 3),
            "bwd_tile_mrays_per_s": round(
                2.0 * n_train_rays / bwd_tile_s / 1e6, 2),
            "train_ratio_vs_fwd": round(train_med / fwd8_med, 2),
            "train_mrays_per_s": round(n_train_rays / train_med / 1e6,
                                       2),
            "train_step_sharded_s": round(tr_sh_med, 3),
            "scene_build_s": round(build_s, 3),
            **scene_extras,
            "fwd_rays": fwd_rays,
            "bwd_rays": n_bwd_rays,
            "backend": jax.default_backend(),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
