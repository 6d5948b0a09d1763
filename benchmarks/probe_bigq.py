import os, time
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import rrt_tpu
from rrt_tpu.render import render_image_queue, RenderConfig
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)
import sys
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cfg = RenderConfig(width=1200, height=800, spp=8, max_depth=50,
                   queue_size=Q, bounces_per_refill=K)
t0=time.time()
img, n = render_image_queue(scene, cam, cfg, 0)
img.block_until_ready()
print(f"Q={Q} K={K} compile+run {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(2):
    t0=time.time()
    img, n = render_image_queue(scene, cam, cfg, 0)
    img.block_until_ready()
    ts.append(time.time()-t0)
dt=min(ts)
print(f"run {dt:.2f}s rays {float(n)/1e6:.1f}M -> {float(n)/dt/1e6:.2f} Mrays/s", flush=True)
