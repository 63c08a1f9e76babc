"""ctypes bindings for the native TFRecord engine (native/tfrecord_c.cpp).

Auto-builds the shared library on first use when a toolchain is present;
every entry point has a pure-python fallback (data.tfrecord), so the
framework works without a compiler — just slower on the host-IO edges.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtfrecord_c.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tfrec_crc32c.restype = ctypes.c_uint32
    lib.tfrec_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.tfrec_masked_crc.restype = ctypes.c_uint32
    lib.tfrec_masked_crc.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.tfrec_count.restype = ctypes.c_int64
    lib.tfrec_count.argtypes = [ctypes.c_char_p]
    lib.tfrec_load_poses.restype = ctypes.c_int64
    lib.tfrec_load_poses.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.tfrec_frame_record.restype = ctypes.c_int64
    lib.tfrec_frame_record.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def crc32c(data: bytes) -> int | None:
    lib = _load()
    if lib is None:
        return None
    return int(lib.tfrec_crc32c(data, len(data)))


def masked_crc(data: bytes) -> int | None:
    lib = _load()
    if lib is None:
        return None
    return int(lib.tfrec_masked_crc(data, len(data)))


def count_records(path: str) -> int | None:
    lib = _load()
    if lib is None:
        return None
    n = int(lib.tfrec_count(path.encode()))
    return None if n < 0 else n


def load_pose_file(path: str) -> dict[str, np.ndarray] | None:
    """Parse one pose tfrecord file natively; None -> use the fallback."""
    lib = _load()
    if lib is None:
        return None
    cap = count_records(path)
    if cap is None:
        return None
    trans = np.empty((cap, 3), np.float32)
    axag = np.empty((cap, 3), np.float32)
    cls = np.empty((cap,), np.int32)
    n = int(
        lib.tfrec_load_poses(
            path.encode(),
            trans.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            axag.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
    )
    if n < 0:
        return None
    return {
        "translation": trans[:n],
        "axisangle": axag[:n],
        "class_id": cls[:n],
    }


def frame_record(payload: bytes) -> bytes | None:
    """Produce one framed record (len+crc | payload | crc) natively."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(len(payload) + 16, np.uint8)
    n = int(
        lib.tfrec_frame_record(
            payload, len(payload),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    )
    return out[:n].tobytes()
