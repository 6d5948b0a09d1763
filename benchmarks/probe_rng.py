"""Time the in-kernel cost of one Threefry-2x32 (20 rounds, add/xor/rot
only) vs one pcg4d (Jarzynski & Olano, JCGT 2020 — 20 u32 multiplies)
on the megakernel's (1, TN) row shape, to decide whether the draw mixer
is worth swapping (threefry is ~95 u32 ops/call and the bounce loop
makes ~8 calls/step).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_rng.py
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

from rrt_tpu import rng

ITERS = 20000


def pcg4d(a, b, c, d):
    mul = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> jnp.uint32(16))
    b = b ^ (b >> jnp.uint32(16))
    c = c ^ (c >> jnp.uint32(16))
    d = d ^ (d >> jnp.uint32(16))
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def make_fn(mode):
    shape = (1, 1024)

    def kern(x_ref, o_ref):
        x = x_ref[:]

        def body(i, carry):
            x0, x1 = carry
            ci = jnp.uint32(i)
            if mode == "threefry":
                return rng.threefry2x32(x0, x1, ci, ci + jnp.uint32(1))
            if mode == "pcg4d":
                a, b, c, d = pcg4d(x0, x1, ci, ci + jnp.uint32(1))
                return a ^ c, b ^ d
            # baseline: loop body with a trivial op, to subtract loop cost
            return x0 + ci, x1 ^ ci

        y0, y1 = jax.lax.fori_loop(0, ITERS, body, (x, x))
        o_ref[:] = y0 ^ y1

    return jax.jit(lambda x: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32))(x))


def main():
    for mode in ["baseline", "threefry", "pcg4d"]:
        fn = make_fn(mode)
        x = jnp.full((1, 1024), 12345, jnp.uint32)
        int(fn(x)[0, 0])
        ts = []
        for _ in range(5):
            t0 = time.time()
            int(fn(x)[0, 0])
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        print(f"{mode:9s} median {med * 1e3:8.2f} ms"
              f"  ({med * 1e9 / ITERS:7.1f} ns/call)", flush=True)


if __name__ == "__main__":
    main()
