"""ctypes bridge to the native C++ golden renderer (native/golden.cc).

Builds the shared library on demand with g++ (no pip deps, no pybind11 —
the environment mandates ctypes/cffi bridging). The C++ tracer is the
second, independent implementation of the books' method used for allclose
validation of the device renderer; it consumes the same draw tensors
(rrt_tpu.golden.extract_draws)."""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "golden.cc")
_LIB = os.path.join(_NATIVE_DIR, "libgolden.so")

_lib = None


class _CScene(ctypes.Structure):
    _fields_ = [
        ("n_spheres", ctypes.c_int32),
        ("sphere_c0", ctypes.c_void_p),
        ("sphere_dc", ctypes.c_void_p),
        ("sphere_t0", ctypes.c_void_p),
        ("sphere_inv_dt", ctypes.c_void_p),
        ("sphere_radius", ctypes.c_void_p),
        ("sphere_mat", ctypes.c_void_p),
        ("sphere_valid", ctypes.c_void_p),
        ("n_quads", ctypes.c_int32),
        ("quad_q", ctypes.c_void_p),
        ("quad_u", ctypes.c_void_p),
        ("quad_v", ctypes.c_void_p),
        ("quad_mat", ctypes.c_void_p),
        ("quad_valid", ctypes.c_void_p),
        ("n_media", ctypes.c_int32),
        ("med_btype", ctypes.c_void_p),
        ("med_center", ctypes.c_void_p),
        ("med_radius", ctypes.c_void_p),
        ("med_half", ctypes.c_void_p),
        ("med_rot", ctypes.c_void_p),
        ("med_neg_inv_density", ctypes.c_void_p),
        ("med_mat", ctypes.c_void_p),
        ("med_valid", ctypes.c_void_p),
        ("mat_type", ctypes.c_void_p),
        ("mat_tex", ctypes.c_void_p),
        ("mat_fuzz", ctypes.c_void_p),
        ("mat_ior", ctypes.c_void_p),
        ("tex_type", ctypes.c_void_p),
        ("tex_color1", ctypes.c_void_p),
        ("tex_color2", ctypes.c_void_p),
        ("tex_scale", ctypes.c_void_p),
        ("tex_image", ctypes.c_void_p),
        ("n_images", ctypes.c_int32),
        ("img_h", ctypes.c_int32),
        ("img_w", ctypes.c_int32),
        ("images", ctypes.c_void_p),
        ("bg_mode", ctypes.c_int32),
        ("bg_bottom", ctypes.c_void_p),
        ("bg_top", ctypes.c_void_p),
    ]


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_LIB)
        _lib.rrt_golden_trace.restype = None
    return _lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def trace(scene, o, d, time, draws, max_depth, t_min=1.0e-3):
    """Trace rays through the native golden tracer.

    scene: SceneArrays (device or host). draws: from golden.extract_draws.
    Returns radiance (N,3) float32."""
    lib = get_lib()

    f32 = lambda name: np.ascontiguousarray(
        np.asarray(getattr(scene, name)), np.float32)
    i32 = lambda name: np.ascontiguousarray(
        np.asarray(getattr(scene, name)), np.int32)
    u8 = lambda name: np.ascontiguousarray(
        np.asarray(getattr(scene, name)), np.uint8)

    # Keep every array alive for the duration of the call.
    keep = {}
    for name in ("sphere_c0", "sphere_dc", "sphere_t0", "sphere_inv_dt",
                 "sphere_radius", "quad_q", "quad_u", "quad_v",
                 "med_center", "med_radius", "med_half", "med_rot",
                 "med_neg_inv_density", "mat_fuzz", "mat_ior",
                 "tex_color1", "tex_color2", "tex_scale",
                 "images", "bg_bottom", "bg_top"):
        keep[name] = f32(name)
    for name in ("sphere_mat", "quad_mat", "med_btype", "med_mat",
                 "mat_type", "mat_tex", "tex_type", "tex_image"):
        keep[name] = i32(name)
    for name in ("sphere_valid", "quad_valid", "med_valid"):
        keep[name] = u8(name)

    n_quads = scene.n_quads
    if getattr(scene, "has_boxes", False):
        # The C++ tracer stays quad-only: expand the box family into the
        # books' 6-quad decomposition (same as golden.GoldenScene).
        from .scene import boxes_as_quads
        bq, bu, bv, bm = boxes_as_quads(
            np.asarray(scene.box_center), np.asarray(scene.box_half),
            np.asarray(scene.box_cos), np.asarray(scene.box_sin),
            np.asarray(scene.box_mat), np.asarray(scene.box_valid))
        keep["quad_q"] = np.ascontiguousarray(
            np.concatenate([keep["quad_q"], bq]), np.float32)
        keep["quad_u"] = np.ascontiguousarray(
            np.concatenate([keep["quad_u"], bu]), np.float32)
        keep["quad_v"] = np.ascontiguousarray(
            np.concatenate([keep["quad_v"], bv]), np.float32)
        keep["quad_mat"] = np.ascontiguousarray(
            np.concatenate([keep["quad_mat"], bm]), np.int32)
        keep["quad_valid"] = np.ascontiguousarray(
            np.concatenate([keep["quad_valid"],
                            np.ones(len(bm), np.uint8)]), np.uint8)
        n_quads += len(bm)

    cs = _CScene()
    cs.n_spheres = scene.n_spheres
    cs.n_quads = n_quads
    cs.n_media = scene.n_media
    images = keep["images"]
    cs.n_images, cs.img_h, cs.img_w = images.shape[0], images.shape[1], \
        images.shape[2]
    cs.bg_mode = int(np.asarray(scene.bg_mode))
    for name in keep:
        setattr(cs, name, _ptr(keep[name]))

    o = np.ascontiguousarray(np.asarray(o), np.float32)
    d = np.ascontiguousarray(np.asarray(d), np.float32)
    time = np.ascontiguousarray(np.asarray(time), np.float32)
    n = o.shape[0]

    b = max_depth + 1
    unit = np.ascontiguousarray(np.stack(
        [draws[(i, "unit")] for i in range(b)]), np.float32)
    sphere = np.ascontiguousarray(np.stack(
        [draws[(i, "sphere")] for i in range(b)]), np.float32)
    choice = np.ascontiguousarray(np.stack(
        [draws[(i, "choice")] for i in range(b)]), np.float32)
    medium = np.ascontiguousarray(np.stack(
        [draws[(i, "medium")] for i in range(b)]), np.float32)
    med_stride = medium.shape[-1]

    out = np.zeros((n, 3), np.float32)
    lib.rrt_golden_trace(
        ctypes.byref(cs), _ptr(o), _ptr(d), _ptr(time),
        ctypes.c_int(n), ctypes.c_int(max_depth), ctypes.c_float(t_min),
        _ptr(unit), _ptr(sphere), _ptr(choice), _ptr(medium),
        ctypes.c_int(med_stride), _ptr(out))
    return out
