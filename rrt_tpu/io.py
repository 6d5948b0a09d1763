"""Image IO: PPM/PNG writers and checkpoint save/restore.

The reference always writes `o.ppm` (RGB8 via the image crate,
src/main.rs:100-107). Here the output format follows the file extension,
and long renders can checkpoint their float accumulator + sample cursor so
a 500-spp render survives interruption (SURVEY.md §5.4) — re-rendering any
remaining samples is exact because sample keys are (pixel, sample)
addressed."""

import json
import struct
import zlib

import numpy as np


def write_ppm(path: str, rgb8: np.ndarray) -> None:
    h, w = rgb8.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(rgb8, dtype=np.uint8).tobytes())


def write_png(path: str, rgb8: np.ndarray) -> None:
    """Minimal dependency-free PNG encoder (8-bit RGB, zlib filter 0)."""
    h, w = rgb8.shape[:2]
    raw = b"".join(
        b"\x00" + np.ascontiguousarray(rgb8[y], np.uint8).tobytes()
        for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_image(path: str, rgb8: np.ndarray) -> None:
    if path.endswith(".png"):
        write_png(path, rgb8)
    else:
        write_ppm(path, rgb8)


def read_image(path: str) -> np.ndarray:
    """Load an image file as (h, w, 3) float32 in [0, 1] — the input
    format of SceneBuilder.image / the scene builders' `image=` kwarg
    (the reference bundles no loader either; RTTNW's earthmap.jpg is
    read by stb_image in the book's C++). PPM (P6) is decoded natively;
    everything else goes through PIL when available."""
    if path.endswith(".ppm"):
        with open(path, "rb") as f:
            data = f.read()
        # P6 header: magic + 3 whitespace-separated ints (with optional
        # '#' comments), then EXACTLY ONE whitespace byte before the
        # raster. A naive split() would eat raster bytes that happen to
        # be whitespace values (9/10/13/32 are valid pixel intensities).
        pos = 0

        def token():
            nonlocal pos
            while True:
                while pos < len(data) and data[pos:pos + 1].isspace():
                    pos += 1
                if data[pos:pos + 1] == b"#":  # comment to end of line
                    while pos < len(data) and data[pos] != 0x0A:
                        pos += 1
                else:
                    break
            start = pos
            while pos < len(data) and not data[pos:pos + 1].isspace():
                pos += 1
            return data[start:pos]

        if token() != b"P6":
            raise ValueError(f"{path}: only binary PPM (P6) supported")
        w, h, maxval = int(token()), int(token()), int(token())
        if not 0 < maxval < 256:
            raise ValueError(
                f"{path}: only 8-bit PPM supported (maxval {maxval})")
        pos += 1  # the single whitespace byte after maxval
        raster = data[pos:pos + w * h * 3]
        if len(raster) < w * h * 3:
            raise ValueError(f"{path}: truncated PPM raster")
        img = np.frombuffer(raster, np.uint8).reshape(h, w, 3)
        return img.astype(np.float32) / float(maxval)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is baked in
        raise ValueError(
            f"{path}: non-PPM textures need PIL (pip install pillow)"
        ) from e
    img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return img.astype(np.float32) / 255.0


def save_checkpoint(path: str, radiance_sum: np.ndarray, spp_done: int,
                    seed: int, meta: dict | None = None) -> None:
    """Persist the float radiance accumulator (sum over samples) plus the
    (seed, spp) cursor needed to resume exactly."""
    np.savez_compressed(
        path, radiance_sum=np.asarray(radiance_sum, np.float32),
        spp_done=np.int64(spp_done), seed=np.int64(seed),
        meta=json.dumps(meta or {}))


def load_checkpoint(path: str):
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    return z["radiance_sum"], int(z["spp_done"]), int(z["seed"]), meta
