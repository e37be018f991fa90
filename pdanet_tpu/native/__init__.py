"""Native host-side kernels: build-on-first-import C++ with ctypes bindings.

The reference keeps its host/CPU op halves in C++ torch extensions
(``iou3d_cpu.cpp``, spconv's ``Point2VoxelCPU3d`` voxelizer,
``roiaware_pool3d.cpp`` points_in_boxes_cpu).  Here the equivalents live in
``src/pdanet_host.cc`` — plain C++17, no torch — compiled once with g++ into
a content-hashed shared library under ``_build/`` and loaded via ctypes.

Everything degrades gracefully: if g++ is missing, the compile fails, or
``PDANET_DISABLE_NATIVE=1`` is set, ``NATIVE_AVAILABLE`` is False and every
wrapper returns None so callers fall back to their numpy implementations
(which tests/test_native.py holds bit-compatible).
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "pdanet_host.cc")
_BUILD_DIR = os.path.join(_HERE, "_build")

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _compile_and_load():
    if os.environ.get("PDANET_DISABLE_NATIVE"):
        return None
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:12]
    except OSError:
        return None
    so_path = os.path.join(_BUILD_DIR, "pdanet_host_%s.so" % tag)
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        tmp = "%s.tmp.%d" % (so_path, os.getpid())
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-fno-math-errno", _SRC, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.rotated_overlap_f64.restype = None
    lib.rotated_overlap_f64.argtypes = [_f64p, _i64, _f64p, _i64, _f64p]
    lib.points_in_boxes_f32.restype = None
    lib.points_in_boxes_f32.argtypes = [_f32p, _i64, _f32p, _i64, _i32p]
    lib.voxelize_f32.restype = _i64
    lib.voxelize_f32.argtypes = [
        _f32p, _i64, _i64, _f32p, _f32p, _i64p, _i64, _i64,
        _f32p, _i32p, _i32p,
    ]
    return lib


_LIB = _compile_and_load()
NATIVE_AVAILABLE = _LIB is not None


def rotated_overlap(boxes_a, boxes_b):
    """(N, 5) x (K, 5) ``(cx, cy, w, h, angle)`` -> (N, K) f64 intersection
    areas, or None when the native library is unavailable."""
    if _LIB is None:
        return None
    a = np.ascontiguousarray(boxes_a, dtype=np.float64)
    b = np.ascontiguousarray(boxes_b, dtype=np.float64)
    n, k = len(a), len(b)
    out = np.zeros((n, k), dtype=np.float64)
    if n and k:
        _LIB.rotated_overlap_f64(a, n, b, k, out)
    return out


def points_in_boxes(points, boxes):
    """(N, 3) x (M, 7) -> (M, N) int32 0/1 mask, or None."""
    if _LIB is None:
        return None
    p = np.ascontiguousarray(points[:, 0:3], dtype=np.float32)
    b = np.ascontiguousarray(boxes, dtype=np.float32)
    n, m = len(p), len(b)
    out = np.zeros((m, n), dtype=np.int32)
    if n and m:
        _LIB.points_in_boxes_f32(p, n, b, m, out)
    return out


def voxelize(points, point_cloud_range, voxel_size, grid_size, max_pts,
             max_voxels):
    """Grid-hash voxelization; returns (voxels, coords_zyx, num_points) or
    None.  Semantics identical to the numpy voxelizer in
    datasets/processor/data_processor.py (first-come orders, capped counts)."""
    if _LIB is None:
        return None
    p = np.ascontiguousarray(points, dtype=np.float32)
    pcr = np.ascontiguousarray(point_cloud_range, dtype=np.float32)
    vsz = np.ascontiguousarray(voxel_size, dtype=np.float32)
    grid = np.ascontiguousarray(grid_size, dtype=np.int64)
    n, c = p.shape
    voxels = np.zeros((max_voxels, max_pts, c), dtype=np.float32)
    coords = np.zeros((max_voxels, 3), dtype=np.int32)
    num_points = np.zeros((max_voxels,), dtype=np.int32)
    nv = _LIB.voxelize_f32(
        p, n, c, pcr, vsz, grid, max_pts, max_voxels, voxels, coords,
        num_points,
    )
    return voxels[:nv], coords[:nv], num_points[:nv]
