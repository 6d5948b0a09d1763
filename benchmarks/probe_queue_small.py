import time, jax, jax.numpy as jnp
import rrt_tpu
from rrt_tpu.render import render_image_queue
from rrt_tpu.scenes import chap12_scene

cfg = rrt_tpu.RenderConfig(width=200, height=100, spp=2, max_depth=50,
                           queue_size=16384)
scene, cam = chap12_scene(cfg.width, cfg.height)
print("built scene", flush=True)
t0=time.time()
img, n = render_image_queue(scene, cam, cfg, 0)
jax.block_until_ready(img)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0=time.time()
    img, n = render_image_queue(scene, cam, cfg, 0)
    jax.block_until_ready(img)
    dt=time.time()-t0
    print(f"run {dt:.2f}s rays {float(n)/1e6:.2f}M -> {float(n)/dt/1e6:.1f} Mrays/s", flush=True)
