"""Driver benchmark: prints a JSON record line, re-emitted after EVERY
phase (the consumer takes the last parseable line).

Metrics:
  - legacy headline (``value``): Mrays/s/chip fwd+bwd on the RTIOW final
    scene (chap12, 1200x800). Forward is the tile megakernel at 32 spp;
    backward is the fused custom_vjp chain path at depth 50 on a 262k-ray
    fixed batch (the round-1 definition, kept verbatim so vs_baseline
    tracks real movement round over round).
  - ``headline_v2``: the product path — full-image tile forward plus the
    fused tile train backward at 8 spp, (fwd_rays + 2*bwd_rays) /
    (fwd8_s + bwd_tile_s). This is what `make_train_step` actually runs;
    the legacy chain path exists only for comparability (VERDICT r3 #4).

Statistical contract (VERDICT r1 #7, mirroring the role of the
reference's criterion harness /root/reference/benches/benchmark.rs:38-42):
every timing is the median of N post-warmup iterations with the min/max
spread reported; scenes whose wall is under ~0.5 s get median-of-9
(VERDICT r3 weak #6 — ±5% tunnel noise on 0.2 s walls is unresolvable
at n=3); scene construction is timed separately (the analog of the
reference's `chap12_scene` bench, benches/benchmark.rs:29-36).

Fault tolerance — the record must survive BOTH failure modes that cost
rounds 3 and 4 their official records:

  * exceptions (BENCH_r03 rc=1: one transient tunnel fault 45 min in):
    every phase runs under a bounded retry (rrt_tpu.utils.retry);
    terminal failures are recorded in `errors` and the run continues;
  * the driver's wall clock (BENCH_r04 rc=124: SIGTERM before the one
    end-of-run emit): the full record line is re-emitted after EVERY
    phase; a SIGTERM/SIGINT handler emits once more and exits; a wall
    budget (RRT_BENCH_WALL_S, default 540 s) skips phases whose
    estimated cost no longer fits, recording them in `skipped`; and the
    phases are ordered headline-first so the cheap load-bearing fields
    (fwd, bwd_chain, train_tile -> value + headline_v2) land before the
    multi-minute north-star phase, which runs LAST.

The reference's criterion harness always produces its report
(/root/reference/benches/benchmark.rs:38-42); so does this, under
timeout(1) included.

Per-phase wall times are recorded in `detail.phase_walls` (VERDICT r4
next #2); measured values from a warm-cache chip run live in BASELINE.md
"Bench phase walls" and are the basis of the per-phase estimates below.

vs_baseline compares against the round-1 record in BASELINE.md (12.9).
"""

import json
import os
import signal
import statistics
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

N_ITERS = 5
N_ITERS_FAST = 9  # scenes whose wall is < FAST_WALL_S (VERDICT r3 weak #6)
FAST_WALL_S = 0.5
MAX_ATTEMPTS = 3  # bounded retry per phase on transient runtime faults
# Wall budget for the whole run: phases whose estimate no longer fits are
# skipped (recorded in `skipped`), so the process exits cleanly inside
# the driver's timeout instead of being killed by it. Overridable for
# longer local runs (RRT_BENCH_WALL_S=1e9 python bench.py).
WALL_BUDGET_S = float(os.environ.get("RRT_BENCH_WALL_S", "540"))


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin
from rrt_tpu.utils.retry import is_transient as _is_transient  # noqa: E402
# Failure classes worth retrying: the axon tunnel surfaces transient
# HTTP/stream faults as JaxRuntimeError (BENCH_r03: "response body closed
# before all bytes were read") and occasionally as OSError. The
# classifier lives in rrt_tpu.utils.retry, shared with the multi-chip
# dry run and long CLI renders.


class Recorder:
    """Accumulates detail fields as phases complete and re-emits the
    full (partial) JSON record line after every phase, so a SIGKILL at
    any point costs only the unfinished phase."""

    def __init__(self, metric="fwd+bwd Mrays/s/chip (chap12 1200x800)",
                 wall_budget_s=WALL_BUDGET_S):
        self.detail = {}
        self.errors = {}
        self.skipped = []
        self.phase_walls = {}
        self.metric = metric
        self.wall_budget_s = wall_budget_s
        self.t0 = time.time()
        self.current = None
        # Recomputed at every emit from whatever has been measured so
        # far; main() swaps in the real closure once `state` exists.
        self.headline = lambda: (None, None)

    def elapsed(self):
        return time.time() - self.t0

    def budget_left(self):
        return self.wall_budget_s - self.elapsed()

    def phase(self, name, fn, est_s=0.0, max_attempts=MAX_ATTEMPTS):
        """Run fn() under bounded retry (rrt_tpu.utils.retry — one
        retry policy for the whole repo). Returns its value, or None
        after recording the terminal failure (in `errors`) or the
        budget skip (in `skipped`). Transient faults re-run the phase
        from the top (fn must be idempotent: each phase re-warms its
        own compiled functions, so a retry pays at most a cached
        compile). The record line is re-emitted either way."""
        if est_s and self.budget_left() < est_s:
            self.skipped.append(name)
            self.emit_now()
            return None
        from rrt_tpu.utils.retry import with_retries
        self.current = name
        t_phase = time.time()
        out, err_tb = None, None
        try:
            out = with_retries(fn, max_attempts=max_attempts)
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — record + continue
            # format_exc() must run INSIDE the except block — the
            # exception state is cleared when it exits.
            err_tb = traceback.format_exc()
            self.errors[name] = "%s: %s" % (type(e).__name__,
                                            str(e).split("\n")[0][:300])
        self.current = None
        self.phase_walls[name] = round(time.time() - t_phase, 1)
        self.emit_now()
        if err_tb is not None:
            sys.stderr.write("bench phase %r failed terminally:\n%s\n"
                             % (name, err_tb))
        return out

    def emit_now(self):
        value, vs = self.headline()
        self.emit(value, vs, self.metric)

    def emit(self, value, vs_baseline, metric, unit="Mrays/s"):
        d = dict(self.detail)
        d["phase_walls"] = dict(self.phase_walls)
        d["elapsed_s"] = round(self.elapsed(), 1)
        if self.skipped:
            d["skipped"] = list(self.skipped)
        rec = {
            "metric": metric,
            "value": value,
            "unit": unit,
            "vs_baseline": vs_baseline,
            "detail": d,
        }
        if self.errors:
            rec["errors"] = self.errors
        print(json.dumps(rec), flush=True)


def install_signal_handlers(rec):
    """Emit the current record and exit on SIGTERM/SIGINT — timeout(1)
    (the driver's wall clock) sends SIGTERM first; without this the
    whole record dies with the process (BENCH_r04 rc=124). os._exit
    skips interpreter teardown, which can hang on live tunnel state."""
    def handler(signum, frame):
        name = {signal.SIGTERM: "SIGTERM",
                signal.SIGINT: "SIGINT"}.get(signum, "signal %d" % signum)
        rec.errors["signal"] = "%s after %.1f s%s" % (
            name, rec.elapsed(),
            " during phase %r" % rec.current if rec.current else "")
        rec.emit_now()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)


def _timed(fn, sync, n=None):
    """Median + spread of n runs of fn(). Defaults to N_ITERS; when the
    first run is under FAST_WALL_S the count is raised to N_ITERS_FAST
    (cheap — the runs are fast by definition — and it settles the ±5%
    tunnel noise that made sub-second round-over-round deltas
    unresolvable at n=3)."""
    ts = []
    t0 = time.time()
    sync(fn())
    ts.append(time.time() - t0)
    total = n or N_ITERS
    if ts[0] < FAST_WALL_S:
        total = max(total, N_ITERS_FAST)
    for _ in range(total - 1):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    return statistics.median(ts), min(ts), max(ts)


def main():
    rec = Recorder()
    install_signal_handlers(rec)
    d = rec.detail

    if os.environ.get("RRT_BENCH_FORCE_CPU"):
        # Test hook (tests/test_bench_harness.py): the axon TPU plugin
        # ignores JAX_PLATFORMS env, so the CPU pin must go through
        # jax.config before any jax op — grabbing the (single-process)
        # TPU tunnel from inside the test suite would collide with it.
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import rrt_tpu
    from rrt_tpu import rng
    from rrt_tpu.camera import generate_rays
    from rrt_tpu.diff import combine, partition
    from rrt_tpu.render import (RenderConfig, render_image_queue,
                                render_image_tiles, trace_batch,
                                trace_tiles, trace_tiles_diff)
    from rrt_tpu.scenes import (chap12_scene, cornell_box_scene,
                                rttnw_final_scene)

    d["iters"] = N_ITERS
    d["backend"] = jax.default_backend()
    d["wall_budget_s"] = rec.wall_budget_s

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE.md")) as f:
            for line in f:
                if line.startswith("fwd_bwd_mrays_per_s:"):
                    baseline = float(line.split(":")[1])
    except FileNotFoundError:
        pass

    # 32spp per launch: the north-star config is 500spp, and per-launch
    # sample count amortizes the tile driver's straggler tail (45.5
    # Mrays/s at 8spp vs ~62 at 100spp on the same scene); 32 keeps the
    # bench fast while being representative.
    width, height, spp = 1200, 800, 32
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=50,
                       queue_size=131072, bounces_per_refill=4,
                       use_megakernel=True)

    def sync_img(out):
        img, n = out
        float(img[0, 0, 0])  # hard sync (block_until_ready can be lazy
        return out           # through the tunnel runtime)

    def sync_tree(g):
        jax.block_until_ready(g)
        float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
        return g

    state = {}

    def headline():
        """(value, vs_baseline) from whatever has been measured so far —
        called at every emit, so the legacy headline appears as soon as
        fwd+bwd_chain are in and headline_v2 as soon as train_tile is."""
        # Guard on EVERY key each branch reads: headline() also runs
        # from the SIGTERM handler, which can interrupt a phase between
        # two state[...] stores — a KeyError here would swallow the
        # signal and defeat the emit-and-exit guarantee.
        mrays = None
        if all(k in state for k in ("fwd_med", "bwd_med", "fwd_rays",
                                    "bwd_rays")):
            total_rays = state["fwd_rays"] + 2.0 * state["bwd_rays"]
            mrays = round(total_rays / (state["fwd_med"]
                                        + state["bwd_med"]) / 1e6, 2)
        if all(k in state for k in ("fwd8_med", "bwd_tile_s",
                                    "train_rays")):
            v2 = (3.0 * state["train_rays"]
                  / (state["fwd8_med"] + state["bwd_tile_s"]) / 1e6)
            d["headline_v2_mrays_per_s"] = round(v2, 2)
        vs = (round(mrays / baseline, 3)
              if (baseline and mrays is not None)
              else (1.0 if mrays is not None else None))
        return mrays, vs

    rec.headline = headline

    # Phase order is survival order: the four phases that produce the
    # headline fields (scene_build, forward_tile, backward_chain,
    # train_tile) run first; coverage detail rides in the middle; the
    # multi-minute north-star phases run LAST (VERDICT r4 next #1).
    # est_s values come from the measured warm-cache phase walls in
    # BASELINE.md "Bench phase walls".

    # --- phase: backend warm + scene construction (host) ----------------
    # Warm the backend first: the first jax op of the process pays TPU
    # tunnel/backend initialization (~60 s), which is not scene-build
    # cost. Also warm the sync helper: its first float() compiles three
    # tiny jits which otherwise land INSIDE a timed window (the
    # [0.126, 7.239] bwd spread outlier of BENCH_r02).
    def warm_and_build():
        jax.block_until_ready(jnp.zeros(8) + 1.0)
        sync_tree(jnp.ones((2, 2)))
        t0 = time.time()
        scene, cam = chap12_scene(width, height)
        jax.block_until_ready(scene.sphere_c0)
        d["scene_build_s"] = round(time.time() - t0, 3)
        return scene, cam

    built = rec.phase("scene_build", warm_and_build)
    if built is None:  # nothing downstream can run — final emit happened
        return 0
    scene, cam = built

    # --- phase: forward, full image through the tile megakernel ---------
    def fwd():
        return render_image_tiles(scene, cam, cfg, 0)

    def phase_fwd():
        _, n_fwd = sync_img(fwd())  # compile + warm
        sync_img(fwd())
        fwd_rays = float(n_fwd)
        fwd_med, fwd_min, fwd_max = _timed(fwd, sync_img)
        state["fwd_rays"], state["fwd_med"] = fwd_rays, fwd_med
        d["fwd_mrays_per_s"] = round(fwd_rays / fwd_med / 1e6, 2)
        d["fwd_s_median"] = round(fwd_med, 3)
        d["fwd_s_spread"] = [round(fwd_min, 3), round(fwd_max, 3)]
        d["fwd_rays"] = fwd_rays

    rec.phase("forward_tile", phase_fwd)

    # --- phase: backward, fused custom_vjp chain path, depth 50 ---------
    # 262k lanes, the round-1/2 headline config (kept verbatim so
    # vs_baseline tracks real movement). Measured r3: the chain path is
    # ~6.1 Mrays/s nearly flat from 262k to 1M lanes — dead-lane waste
    # inherent to fixed-batch chains at depth 50, NOT per-launch cost.
    # Full-image gradients ride the tile train path (headline_v2).
    params = partition(scene)

    def phase_bwd_chain():
        n_tile = 262144
        ids = jnp.arange(n_tile, dtype=jnp.int32) * (width * height
                                                     // n_tile)
        px, py = ids % width, (ids // width) % height
        gid = (py * width + px).astype(jnp.uint32)
        keys = rng.sample_keys(jax.random.key(0), gid, 0)

        def loss_fn(p):
            s = combine(scene, p)
            o, dr, tm = generate_rays(cam, px, py, width, height, keys)
            rad, n = trace_batch(s, o, dr, tm, keys, cfg.max_depth, 1e-3,
                                 differentiable=True, fused_vjp=True)
            return (jnp.mean(rad.x) + jnp.mean(rad.y)
                    + jnp.mean(rad.z)), n

        grad_fn = jax.jit(jax.grad(lambda p: loss_fn(p)[0]))
        count_fn = jax.jit(lambda p: loss_fn(p)[1])
        sync_tree(grad_fn(params))  # compile + warm
        n_bwd_rays = float(count_fn(params))
        bwd_med, bwd_min, bwd_max = _timed(lambda: grad_fn(params),
                                           sync_tree)
        state["bwd_rays"], state["bwd_med"] = n_bwd_rays, bwd_med
        d["bwd_alone_mrays_per_s"] = round(n_bwd_rays / bwd_med / 1e6, 2)
        d["bwd_depth"] = cfg.max_depth
        d["bwd_step_s_median"] = round(bwd_med, 3)
        d["bwd_s_spread"] = [round(bwd_min, 3), round(bwd_max, 3)]
        d["bwd_rays"] = n_bwd_rays

    rec.phase("backward_chain", phase_bwd_chain)

    # --- phase: fused tile train step, full image at 8spp, depth 50 -----
    # (ops.megakernel_train: one spill-forward launch + one segmented
    # replay+adjoint launch — the product training path and the basis of
    # headline_v2.)
    cfg8 = RenderConfig(width=width, height=height, spp=8, max_depth=50)

    def phase_train_tile():
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
        train_med, _, _ = _timed(lambda: train_grad(params), sync_tree,
                                 n=3)
        spill_med, _, _ = _timed(lambda: fwd_spill(params), sync_tree,
                                 n=3)
        fwd8_med, _, _ = _timed(fwd8, sync_tree, n=3)
        # floor: both medians are independently noisy; a jitter
        # inversion must not emit a negative/inf backward field.
        bwd_tile_s = max(train_med - spill_med, 1e-6)
        state["train_rays"] = n_train_rays
        state["fwd8_med"], state["bwd_tile_s"] = fwd8_med, bwd_tile_s
        d["train_step_8spp_s"] = round(train_med, 3)
        d["train_fwd_8spp_s"] = round(fwd8_med, 3)
        d["train_fwd_spill_8spp_s"] = round(spill_med, 3)
        d["train_bwd_8spp_s"] = round(bwd_tile_s, 3)
        d["bwd_tile_mrays_per_s"] = round(
            2.0 * n_train_rays / bwd_tile_s / 1e6, 2)
        d["train_ratio_vs_fwd"] = round(train_med / fwd8_med, 2)
        d["train_mrays_per_s"] = round(n_train_rays / train_med / 1e6, 2)

    rec.phase("train_tile", phase_train_tile)

    # --- phase: forward, compacted-queue driver (coverage) ---------------
    def phase_fwd_queue():
        def fwd_q():
            return render_image_queue(scene, cam, cfg, 0)
        _, n_fwd = sync_img(fwd_q())  # compile + warm
        q_med, _, _ = _timed(fwd_q, sync_img)
        d["fwd_queue_mrays_per_s"] = round(float(n_fwd) / q_med / 1e6, 2)

    rec.phase("forward_queue", phase_fwd_queue, est_s=30)

    # --- phase: scene coverage — the other BASELINE scenes --------------
    # (headline stays chap12 for round-over-round comparability; these
    # ride along as detail fields. Sub-0.5 s scenes get median-of-9.)
    for name, builder, (w2, h2), est in (
            ("cornell", cornell_box_scene, (400, 400), 25),
            ("rttnw_final", rttnw_final_scene, (400, 267), 45)):
        def phase_scene(builder=builder, w2=w2, h2=h2, name=name):
            sc, cm = builder(w2, h2)
            cfg2 = RenderConfig(width=w2, height=h2, spp=32, max_depth=50,
                                use_megakernel=True)

            def fwd2():
                return render_image_tiles(sc, cm, cfg2, 0)

            _, n2 = sync_img(fwd2())  # compile + warm
            med2, _, _ = _timed(fwd2, sync_img, n=3)
            d[name + "_mrays_per_s"] = round(float(n2) / med2 / 1e6, 2)
            if name == "rttnw_final":
                # Russian-roulette speedup at matched error: MSE vs a
                # 4100-spp golden matches the exact render to ~2%
                # while wall drops 1.66x (BASELINE.md "Russian
                # roulette", error-vs-wall curve). Wall-time lever,
                # not a rays/s one: rays and time shrink together.
                import dataclasses
                cfg_rr = dataclasses.replace(cfg2, rr_depth=4)

                def fwd_rr():
                    return render_image_tiles(sc, cm, cfg_rr, 0)

                sync_img(fwd_rr())
                med_rr, _, _ = _timed(fwd_rr, sync_img, n=3)
                d["rttnw_final_rr4_wall_s"] = round(med_rr, 3)
                d["rttnw_final_rr4_speedup"] = round(med2 / med_rr, 3)

        rec.phase("scene_" + name, phase_scene, est_s=est)

    # --- phase: sharded fused train step, (dp=1, sp=1) mesh -------------
    # (single chip here; proves the shard_map train path compiles and
    # runs on hardware — efficiency at N needs N chips.)
    def phase_train_sharded():
        from rrt_tpu.diff import make_train_step
        from rrt_tpu.parallel.mesh import make_mesh
        mesh1 = make_mesh(devices=jax.devices()[:1], dp=1, sp=1)
        target = jnp.zeros((height, width, 3), jnp.float32)
        step1 = make_train_step(cfg8, mesh=mesh1)
        sync_tree(step1(scene, cam, target, 0))
        tr_sh_med, _, _ = _timed(lambda: step1(scene, cam, target, 0),
                                 sync_tree, n=3)
        d["train_step_sharded_s"] = round(tr_sh_med, 3)

    rec.phase("train_sharded", phase_train_sharded, est_s=40)

    # --- phases: north-star 500spp train step (exact + rr_depth=4) ------
    # The end-to-end training config BASELINE.md's "North-star training"
    # tracks: one warm + up-to-two timed full steps per variant,
    # recording the MIN (each step is ~40-55 s, so medians are
    # unaffordable here; the dedicated harness benchmarks/north_star.py
    # takes medians — same-day ladder in BASELINE.md). Min-of-2 because
    # a single timed step proved fragile in bench context: one run
    # recorded 200.9 s for a step that reproduces at 62.3 s standalone
    # before AND after — a one-off stall (allocator or tunnel), not a
    # real regression; the min sheds it. The second timed step is
    # dropped when the remaining budget can't cover it. These are the
    # most expensive phases, so they run LAST: a driver timeout here
    # costs only these fields (VERDICT r4 next #1).
    import dataclasses
    import gc

    from rrt_tpu.diff import make_train_step_chunked
    cfg500 = RenderConfig(width=width, height=height, spp=500,
                          max_depth=50)
    ns_target = jnp.zeros((height, width, 3), jnp.float32)

    def phase_north_star(name, c, reserve_s=0.0):
        def run():
            gc.collect()  # drop prior variants' parked-residual refs
            step = make_train_step_chunked(c)
            t0 = time.time()
            sync_tree(step(scene, cam, ns_target, 0)[2])  # compile+warm
            warm_s = time.time() - t0
            ts = []
            for _ in range(2):
                t0 = time.time()
                sync_tree(step(scene, cam, ns_target, 0)[2])
                ts.append(time.time() - t0)
                if rec.budget_left() < ts[-1] + reserve_s:
                    # no wall left for a second timed step — reserve_s
                    # keeps the NEXT north-star variant runnable
                    # instead of spending its budget on one more
                    # iteration of this one.
                    break
            best = min(ts)
            if best > 1.2 * warm_s:
                # A steady step cannot be meaningfully slower than the
                # warm step (compile + one step): this is the
                # tunnel-stall pathology (one r4 run recorded 200.9 s,
                # one r5 run 1765 s, for a step that reproduces at
                # ~52 s). Report the warm wall as the honest upper
                # bound and flag the stalled measurement. The 1.2x
                # margin keeps ordinary jitter on fully-cached runs
                # (timed 50.3 vs warm 50.0) from wearing the
                # stall-pathology label.
                d[name + "_stalled_step_s"] = round(best, 1)
                best = warm_s
            d[name] = round(best, 1)
            d[name + "_spread"] = [round(min(ts), 1), round(max(ts), 1)]
            d[name + "_warm_s"] = round(warm_s, 1)
        return run

    # est: warm + two timed steps at measured walls (~52.5 s exact,
    # ~38.6 s with RR; BASELINE.md "North-star training" and "Bench
    # phase walls").
    rec.phase("north_star_exact",
              phase_north_star("north_star_500spp_s", cfg500,
                               reserve_s=120), est_s=160)
    rec.phase("north_star_rr4",
              phase_north_star("north_star_500spp_rr4_s",
                               dataclasses.replace(cfg500, rr_depth=4)),
              est_s=120)

    rec.emit_now()  # final line (also the only line if no phases ran)
    return 0


if __name__ == "__main__":
    sys.exit(main())
