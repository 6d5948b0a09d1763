"""On-device decomposition of the fused tile train backward (VERDICT r3 #3).

BASELINE.md's backward floor claim (replay 1x + transpose >=1x => ~3.2x
train/fwd) was arithmetic; this measures each component as an actual
kernel variant on the chip:

  fwd        trace_tiles (plain forward kernel)
  spill      _fwd_call   (forward + segment-boundary spill)
  bwd full   _bwd_call(ablate=None)        replay + re-derive + vjp
  bwd redv   _bwd_call(ablate="rederive")  replay + re-derive (no vjp)
  bwd replay _bwd_call(ablate="replay")    segment replay only

so the attribution is:
  replay cost      = bwd_replay
  re-derivation    = bwd_redv  - bwd_replay   (the aux _one_bounce +
                     winner selects the in-kernel jax.vjp re-derives)
  transpose/adjoint = bwd_full - bwd_redv     (vjp sweep + pack scatters)

The ablated kernels produce garbage gradients (anti-DCE probes only) —
they exist purely to attribute wall time. Config matches bench.py's
train fields: chap12 1200x800 @ 8spp depth 50.

Run on the real chip: python benchmarks/bwd_profile.py
"""

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


def main():
    from rrt_tpu import rng
    from rrt_tpu.ops import megakernel as mk
    from rrt_tpu.ops import megakernel_train as mkt
    from rrt_tpu.render import (RenderConfig, _tile_packs,
                                tile_chains_diff, trace_tiles)
    from rrt_tpu.scenes import chap12_scene

    cfg = RenderConfig(width=1200, height=800, spp=8, max_depth=50)
    scene, cam = chap12_scene(cfg.width, cfg.height)
    n_samples = cfg.spp
    chains = tile_chains_diff(cfg, n_samples)
    meta = mk.pack_pixel_meta(cfg.width, cfg.height, chains * mk.TN)
    s0, s1 = rng._seed_words(jax.random.key(0))
    seed2 = jnp.stack([s0, s1, jnp.uint32(0),
                       jnp.uint32(0)]).astype(jnp.uint32)
    (cam24, sph24, quad24, box24, med24, bg8, atlas, sb, qb,
     bb) = _tile_packs(scene, cam, cfg)
    if atlas is None:
        atlas = jnp.zeros((8, 128), jnp.float32)
    if box24 is None:
        box24 = jnp.zeros((24, mk.TS), jnp.float32)
        bb = jnp.zeros((1, 8), jnp.float32)
    if qb is None:
        qb = jnp.zeros((1, 8), jnp.float32)
    n_media = scene.n_media_active
    if n_media == 0:
        med24 = jnp.zeros((1, 24), jnp.float32)
    flags = dict(moving=scene.has_moving, has_quads=scene.has_quads,
                 has_boxes=scene.has_boxes,
                 has_rot_boxes=scene.has_rot_boxes,
                 has_perlin=scene.has_perlin,
                 has_images=scene.has_images,
                 img_ah=scene.images.shape[1],
                 img_aw=scene.images.shape[2], n_media=n_media,
                 t_min=cfg.t_min, max_depth=float(cfg.max_depth),
                 fam_n=scene.fam_n)

    # All operands are jit ARGUMENTS: closing over them would embed the
    # ~0.8 GB segment-boundary buffer as an HLO constant and blow the
    # tunnel's compile-request size limit (HTTP 413).
    ops = (meta, seed2, cam24, sph24, quad24, box24, med24, bg8, atlas,
           sb, qb, bb)

    @jax.jit
    def fwd_spill_fn(*ops):
        return mkt._fwd_call(*ops, spp=n_samples, chains=chains, **flags)

    fwd_spill = lambda: fwd_spill_fn(*ops)
    out, bounds = jax.block_until_ready(fwd_spill())
    block = chains * mk.TN
    nsteps = out[4].reshape(-1, block)[:, 0].astype(jnp.int32)[None]
    drad = jnp.ones((4, meta.shape[1]), jnp.float32) * 1e-3

    def bwd_fn(ablate, aux_spill=False):
        @jax.jit
        def f(meta, drad, nsteps, seed2, cam24, sph24, quad24, box24,
              med24, bg8, atlas, sb, qb, bb, bounds):
            return mkt._bwd_call(
                meta, drad, nsteps, seed2, cam24, sph24, quad24, box24,
                med24, bg8, atlas, sb, qb, bb, bounds, spp=n_samples,
                chains=chains, ablate=ablate, aux_spill=aux_spill,
                **flags)
        return lambda: f(meta, drad, nsteps, seed2, cam24, sph24,
                         quad24, box24, med24, bg8, atlas, sb, qb, bb,
                         bounds)

    fwd_plain = jax.jit(lambda s, c: trace_tiles(s, c, cfg, 0))
    fwd_plain_call = lambda: fwd_plain(scene, cam)

    def sync(x):
        jax.block_until_ready(x)
        float(jax.tree_util.tree_leaves(x)[0].ravel()[0])
        return x

    sync(jnp.ones((2, 2)))  # warm the sync helper

    def timed(fn, n=5):
        sync(fn())  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        return statistics.median(ts), min(ts), max(ts)

    res = {}
    res["fwd_s"] = timed(fwd_plain_call)
    res["fwd_spill_s"] = timed(fwd_spill)
    res["bwd_replay_s"] = timed(bwd_fn("replay"))
    res["bwd_rederive_s"] = timed(bwd_fn("rederive"))
    res["bwd_full_s"] = timed(bwd_fn(None))
    res["bwd_full_aux_spill_s"] = timed(bwd_fn(None, aux_spill=True))
    res["bwd_replay_aux_spill_s"] = timed(bwd_fn("replay",
                                                 aux_spill=True))

    fwd = res["fwd_s"][0]
    rep = res["bwd_replay_s"][0]
    red = res["bwd_rederive_s"][0]
    ful = res["bwd_full_s"][0]
    print(json.dumps({
        "config": "chap12 1200x800 @8spp depth50, chains=%d" % chains,
        "medians_s": {k: round(v[0], 4) for k, v in res.items()},
        "spreads_s": {k: [round(v[1], 4), round(v[2], 4)]
                      for k, v in res.items()},
        "decomposition_vs_fwd": {
            "replay": round(rep / fwd, 3),
            "rederive_delta": round((red - rep) / fwd, 3),
            "transpose_delta": round((ful - red) / fwd, 3),
            "bwd_total": round(ful / fwd, 3),
            "bwd_total_aux_spill": round(
                res["bwd_full_aux_spill_s"][0] / fwd, 3),
            "replay_aux_spill": round(
                res["bwd_replay_aux_spill_s"][0] / fwd, 3),
            "spill_overhead": round(res["fwd_spill_s"][0] / fwd, 3),
        },
    }, indent=1))


if __name__ == "__main__":
    main()
