"""TPU validation sweep: megakernel vs XLA queue images on every
kernel-capable scene (earth exercises the in-kernel image atlas;
rttnw_final the full feature set + whole-tile culling)."""

import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import rrt_tpu
from rrt_tpu.render import render_image_queue, RenderConfig
from rrt_tpu.scenes import SCENES

W, H, SPP = 200, 150, 8
names = sys.argv[1:] or ("diffuse", "chap12", "book2chap2",
                         "simple_light", "cornell", "cornell_smoke",
                         "earth", "rttnw_final")
for name in names:
    scene, cam = SCENES[name](W, H)
    cfg_m = RenderConfig(width=W, height=H, spp=SPP, max_depth=20,
                         queue_size=32768, use_megakernel=True)
    cfg_x = RenderConfig(width=W, height=H, spp=SPP, max_depth=20,
                         queue_size=32768, use_megakernel=False)
    t0=time.time()
    im, nm = render_image_queue(scene, cam, cfg_m, 0)
    _ = float(im[0,0,0]); tm = time.time()-t0
    t0=time.time()
    ix, nx = render_image_queue(scene, cam, cfg_x, 0)
    _ = float(ix[0,0,0]); tx = time.time()-t0
    a, b = np.asarray(im), np.asarray(ix)
    print(f"{name:14s} meandiff={np.abs(a-b).mean():.5f} max={np.abs(a-b).max():.3f} "
          f"mean={b.mean():.3f} rays m/x {float(nm)/1e6:.1f}/{float(nx)/1e6:.1f}M "
          f"t m/x {tm:.1f}/{tx:.1f}s", flush=True)
    np.save(f"/tmp/val_{name}.npy", a)
