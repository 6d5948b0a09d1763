import time, jax, jax.numpy as jnp, functools
import rrt_tpu
from rrt_tpu import rng
from rrt_tpu.render import trace_batch, _shade, RenderConfig
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)
key = jax.random.key(0)

def timed_compile(name, fn, *args):
    t0=time.time()
    l = jax.jit(fn).lower(*args)
    t1=time.time()
    c = l.compile()
    print(f"{name}: lower {t1-t0:.1f}s compile {time.time()-t1:.1f}s", flush=True)
    return c

N = 262144
ids = jnp.arange(N, dtype=jnp.uint32)
keys = rng.sample_keys(key, ids, 0)
o = jnp.zeros((N,3)); d = jnp.ones((N,3)); tm = jnp.zeros((N,))
alive = jnp.ones((N,), bool)

# order reversed
pass
# 2. while-loop trace_batch
timed_compile("trace_batch N=262144", functools.partial(trace_batch, max_depth=50, t_min=1e-3, differentiable=False), scene, o, d, tm, keys)
# 3. per-lane rng draws alone
timed_compile("scatter_draws N=262144", lambda k: rng.scatter_draws(k, 3), keys)
