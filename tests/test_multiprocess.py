"""Two-process jax.distributed rendering on the CPU backend.

Proves the multi-host story end-to-end without a cluster (SURVEY.md §4
item 5): two OS processes with 2 virtual CPU devices each form one
4-device ("dp","sp") mesh through `initialize_distributed`, and the
sharded render must match the single-process image."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "mp_image.npy"
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in (env.get("PYTHONPATH", ""), repo) if p])
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert out.exists()

    got = np.load(out)

    # Single-process reference through the plain batch driver.
    from rrt_tpu.render import RenderConfig, render_image
    from rrt_tpu.scenes import chap11_scene

    cfg = RenderConfig(width=32, height=18, spp=4, max_depth=4,
                       tile_pixels=144, samples_per_pass=2)
    scene, cam = chap11_scene(cfg.width, cfg.height)
    want, _ = render_image(scene, cam, cfg, 0)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_two_process_cli_render(tmp_path):
    """The documented multi-host launch recipe (VERDICT r2 missing #3):
    two processes run the SAME rrt-tpu CLI command with their own
    --process-id; process 0 writes the image, which must equal a
    single-process CLI render of the same config."""
    port = _free_port()
    out_mp = tmp_path / "mp.png"
    out_single = tmp_path / "single.png"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in (env.get("PYTHONPATH", ""), repo) if p])
    base = [sys.executable, "-m", "rrt_tpu.cli", "--cpu", "--scene",
            "chap11", "-r", "48x27", "-s", "4", "--max-depth", "5",
            "--quiet"]
    procs = [
        subprocess.Popen(
            base + ["--coordinator", f"localhost:{port}",
                    "--num-processes", "2", "--process-id", str(pid),
                    "-o", str(out_mp)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert out_mp.exists()

    r = subprocess.run(base + ["-o", str(out_single)], env=env,
                       capture_output=True, timeout=560)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    from PIL import Image
    a = np.asarray(Image.open(out_mp)).astype(np.int16)
    b = np.asarray(Image.open(out_single)).astype(np.int16)
    # identical sample set + keys; u8 quantization may flip one code
    assert np.abs(a - b).max() <= 1
