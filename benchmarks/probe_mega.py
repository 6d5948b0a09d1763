import os, time, sys
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import rrt_tpu
from rrt_tpu.render import render_image_queue, RenderConfig
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(400, 225)
base = dict(width=400, height=225, spp=8, max_depth=50, queue_size=131072,
            bounces_per_refill=4)
cfg_x = RenderConfig(**base)
cfg_m = RenderConfig(**base, use_megakernel=True)

t0=time.time(); img_m, n_m = render_image_queue(scene, cam, cfg_m, 0); img_m.block_until_ready()
print(f"mega compile+run {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(3):
    t0=time.time(); img_m, n_m = render_image_queue(scene, cam, cfg_m, 0); img_m.block_until_ready(); ts.append(time.time()-t0)
dtm = min(ts)
print(f"mega run {dtm:.2f}s rays {float(n_m)/1e6:.1f}M -> {float(n_m)/dtm/1e6:.2f} Mrays/s", flush=True)

t0=time.time(); img_x, n_x = render_image_queue(scene, cam, cfg_x, 0); img_x.block_until_ready()
print(f"xla compile+run {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(2):
    t0=time.time(); img_x, n_x = render_image_queue(scene, cam, cfg_x, 0); img_x.block_until_ready(); ts.append(time.time()-t0)
dtx = min(ts)
print(f"xla run {dtx:.2f}s rays {float(n_x)/1e6:.1f}M -> {float(n_x)/dtx/1e6:.2f} Mrays/s", flush=True)

a, b = np.asarray(img_m), np.asarray(img_x)
diff = np.abs(a - b)
print(f"image diff: mean {diff.mean():.5f} max {diff.max():.4f} | mean radiance {b.mean():.4f}", flush=True)
print(f"rays mega {float(n_m)/1e6:.2f}M vs xla {float(n_x)/1e6:.2f}M", flush=True)
