"""Measure the cost of Mosaic's (1,N) <-> (8,N/8) relayout inside a
kernel, to decide whether the megakernel's (1,TN) row math could be
made sublane-dense by reshaping around scalar-heavy sections. Result:
no — the relayout pair costs what the dense section would save (and the
sublane-waste premise itself was later refuted; see BASELINE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_reshape.py

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
OPS = 16


def make_fn(mode):
    shape = (1, 1024)

    def kern(x_ref, o_ref):
        x = x_ref[:]

        def body(i, x):
            if mode == "flat":
                for _ in range(OPS):
                    x = x * 1.0000001 + 1.0e-9
                return x
            y = x.reshape(8, 128)
            for _ in range(OPS):
                y = y * 1.0000001 + 1.0e-9
            return y.reshape(1, 1024)

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x)

    return jax.jit(lambda x: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x))


def main():
    for mode in ["flat", "reshape"]:
        fn = make_fn(mode)
        x = jnp.full((1, 1024), 0.5, jnp.float32)
        float(fn(x)[0, 0])
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(fn(x)[0, 0])
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        print(f"{mode:8s} median {med * 1e3:8.2f} ms"
              f"  ({1024 * ITERS * OPS * 2 / med / 1e9:7.1f} GFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
