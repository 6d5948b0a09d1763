"""Measure VPU utilization of (1, N) row ops vs dense (8, N/8) blocks.

The megakernel keeps ray state as (1, TN) f32 rows. With the f32 native
tile being (8, 128), a (1, 1024) op may execute as 8 one-sublane vregs
(1/8 utilization) unless Mosaic folds the row across sublanes. This
probe times the same elementwise chain on (1, 1024), (8, 128) and
(8, 1024) to settle it.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_row_layout.py

CAVEAT (see BASELINE.md): every launch pays a ~24.5 ms tunnel
floor, so the printed GFLOP/s are floor-dominated — read results
as DELTAS between variants (probe_rng.py subtracts a baseline
body), and beware constant-foldable op chains.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ITERS = 40000
OPS_PER_ITER = 16  # FMAs per loop body


def make_fn(shape):
    def kern(x_ref, o_ref):
        x = x_ref[:]

        def body(i, x):
            for k in range(OPS_PER_ITER):
                x = x * 1.0000001 + 1.0e-9
            return x

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x)

    return jax.jit(lambda x: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x))


def main():
    for shape in [(1, 1024), (8, 128), (8, 1024), (16, 1024)]:
        fn = make_fn(shape)
        x = jnp.full(shape, 0.5, jnp.float32)
        float(fn(x)[0, 0])  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(fn(x)[0, 0])
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        nel = shape[0] * shape[1]
        gflops = nel * ITERS * OPS_PER_ITER * 2 / med / 1e9
        print(f"{str(shape):12s} median {med * 1e3:8.2f} ms"
              f"  ({gflops:7.1f} GFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
