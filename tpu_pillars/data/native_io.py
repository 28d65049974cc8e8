"""Native (C++) point-cloud loading for the host data path.

Wraps tpu_pillars/native/pointcloud.cc via ctypes: one pass fuses .bin read
+ detection-range crop + feature-column select + static-budget padding (and,
for multi-sweep, the rigid sweep->keyframe transform + dt append) — the
reference's np.fromfile + Python slicing per sweep, done natively. Compiled
on first use with g++ (cached .so); every entry point has a NumPy fallback
so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from tpu_pillars.config import PillarsConfig
from tpu_pillars.utils.truncation import IO_TRUNCATION

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "pointcloud.cc")
_SO = os.path.join(_NATIVE_DIR, "_pointcloud.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.load_crop_pad.restype = ctypes.c_int64
            lib.load_crop_pad.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.load_transform_crop_pad.restype = ctypes.c_int64
            lib.load_transform_crop_pad.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def _crop_array(config: PillarsConfig) -> np.ndarray:
    return np.asarray(
        [config.x_min, config.x_max, config.y_min, config.y_max,
         config.z_min, config.z_max], dtype=np.float32)


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_points_padded(path: str, config: PillarsConfig,
                       in_stride: int = 5, pad_value: float = 1e6,
                       use_native: Optional[bool] = None):
    """.bin file -> ((max_points, num_raw_features) f32 padded, count).

    The output array feeds the jitted pipeline directly (already cropped to
    the detection range, so every surviving point lands in a pillar).
    In-range points beyond max_points are dropped first-max_points (file
    order) and recorded in utils.truncation.IO_TRUNCATION — never silent.
    """
    n_take = config.num_raw_features
    out = np.full((config.max_points, n_take), pad_value, dtype=np.float32)
    lib = _load_library() if use_native in (None, True) else None
    if lib is not None:
        total = lib.load_crop_pad(
            path.encode(), in_stride, n_take, _fptr(out),
            config.max_points, _fptr(_crop_array(config)))
        if total < 0:
            raise FileNotFoundError(path)
        n = min(int(total), config.max_points)
        IO_TRUNCATION.record(total, n, label=path)
        return out, np.int32(n)
    if use_native:
        raise RuntimeError("native pointcloud library unavailable")
    # NumPy fallback — identical semantics
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, in_stride)
    m = (
        (pts[:, 0] >= config.x_min) & (pts[:, 0] < config.x_max)
        & (pts[:, 1] >= config.y_min) & (pts[:, 1] < config.y_max)
        & (pts[:, 2] >= config.z_min) & (pts[:, 2] <= config.z_max)
    )
    kept = pts[m][: config.max_points, :n_take]
    out[: len(kept)] = kept
    IO_TRUNCATION.record(int(m.sum()), len(kept), label=path)
    return out, np.int32(len(kept))


def load_sweeps_padded(paths, transforms, dts, config: PillarsConfig,
                       in_stride: int = 5, pad_value: float = 1e6,
                       use_native: Optional[bool] = None):
    """Fused multi-sweep load: for each sweep i, apply the 3x4 [R|t] rigid
    map into the keyframe frame, crop, append dt — accumulated into one
    (max_points, num_raw_features + 1) padded array.

    transforms: list of (3, 4) float row-major arrays; dts: seconds per sweep.
    In-range points beyond the budget (easy to hit when accumulating 10
    sweeps) are dropped first-max_points (sweep order, then file order) and
    recorded in utils.truncation.IO_TRUNCATION — never silent.
    """
    n_take = config.num_raw_features
    out = np.full((config.max_points, n_take + 1), pad_value, dtype=np.float32)
    crop = _crop_array(config)
    lib = _load_library() if use_native in (None, True) else None
    written = 0
    in_range = 0
    if lib is not None:
        for path, rt, dt in zip(paths, transforms, dts):
            rt32 = np.ascontiguousarray(rt, dtype=np.float32)
            n = lib.load_transform_crop_pad(
                path.encode(), in_stride, n_take, _fptr(rt32),
                ctypes.c_float(float(dt)), _fptr(out), config.max_points,
                _fptr(crop), written)
            if n < 0:
                raise FileNotFoundError(path)
            in_range += n
            written = min(written + n, config.max_points)
        IO_TRUNCATION.record(in_range, written,
                             label=f"{len(paths)}-sweep accumulation")
        return out, np.int32(written)
    if use_native:
        raise RuntimeError("native pointcloud library unavailable")
    for path, rt, dt in zip(paths, transforms, dts):
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, in_stride)
        xyz = pts[:, :3] @ np.asarray(rt, np.float32)[:, :3].T + np.asarray(
            rt, np.float32)[:, 3]
        m = (
            (xyz[:, 0] >= config.x_min) & (xyz[:, 0] < config.x_max)
            & (xyz[:, 1] >= config.y_min) & (xyz[:, 1] < config.y_max)
            & (xyz[:, 2] >= config.z_min) & (xyz[:, 2] <= config.z_max)
        )
        in_range += int(m.sum())
        keep = np.nonzero(m)[0][: config.max_points - written]
        rows = np.concatenate(
            [xyz[keep], pts[keep, 3:n_take],
             np.full((len(keep), 1), dt, np.float32)], axis=1)
        out[written : written + len(rows)] = rows
        written += len(rows)
    IO_TRUNCATION.record(in_range, written,
                         label=f"{len(paths)}-sweep accumulation")
    return out, np.int32(written)
