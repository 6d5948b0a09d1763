"""Worker for test_multiprocess.py: one JAX process in a 2-process CPU
process group. Renders a scene over the global ("dp","sp") mesh and (on
process 0) writes the gathered image to disk for the parent to compare
against a single-process render.

Run: python _mp_worker.py <pid> <nproc> <port> <out.npy>
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out = sys.argv[3], sys.argv[4]
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from rrt_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                       render_image_sharded)

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc, jax.devices()

    from rrt_tpu.render import RenderConfig
    from rrt_tpu.scenes import chap11_scene

    cfg = RenderConfig(width=32, height=18, spp=4, max_depth=4,
                       tile_pixels=144, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    mesh = make_mesh(dp=2, sp=2)
    img, n_traced = render_image_sharded(scene, cam, cfg, 0, mesh)

    from jax.experimental import multihost_utils

    img_full = multihost_utils.process_allgather(img, tiled=True)
    if pid == 0:
        import numpy as np

        np.save(out, np.asarray(img_full))
    jax.effects_barrier()
    return 0


if __name__ == "__main__":
    sys.exit(main())
