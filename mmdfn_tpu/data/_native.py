"""ctypes shim for the native C++ batch packer (build-on-first-use).

Compiles ``mmdfn_tpu/data/native/packer.cpp`` with the system ``g++`` into a
per-user cache directory the first time it's needed, then loads it via
ctypes.  Everything degrades gracefully: if no compiler is available (or the
env var ``MMDFN_NO_NATIVE=1`` is set) the pure-numpy path in
:mod:`mmdfn_tpu.data.batching` is used — the native packer is a host-side
throughput optimization, not a correctness dependency (byte-identical output
is asserted in tests).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "packer.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build_dir() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    root = os.environ.get("MMDFN_NATIVE_CACHE",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "mmdfn_tpu"))
    return os.path.join(root, f"packer-{digest}")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MMDFN_NO_NATIVE"):
            return None
        try:
            d = _build_dir()
            so = os.path.join(d, "libpacker.so")
            if not os.path.exists(so):
                os.makedirs(d, exist_ok=True)
                tmp = so + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", tmp, _SRC],
                    check=True, capture_output=True)
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            lib.pack_f32.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p]
            lib.pack_masks_labels.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except Exception as e:                       # toolchain missing, etc.
            sys.stderr.write(f"mmdfn_tpu: native packer unavailable ({e}); "
                             "using numpy path\n")
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def pack_f32(arrs: List[np.ndarray], B: int, L: int, D: int) -> Optional[np.ndarray]:
    """Native equivalent of batching._pack; None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(arrs)
    arrs = [np.ascontiguousarray(a, dtype=np.float32) for a in arrs]
    # Mirror the numpy path's errors before handing raw pointers to memcpy:
    # an oversize dialogue or dim mismatch must raise, not corrupt the heap.
    for i, a in enumerate(arrs):
        if a.ndim != 2 or a.shape[1] != D:
            raise ValueError(f"pack_f32: arrs[{i}] has shape {a.shape}, "
                             f"expected (len<={L}, {D})")
        if a.shape[0] > L:
            raise ValueError(f"pack_f32: arrs[{i}] length {a.shape[0]} "
                             f"exceeds bucket L={L}")
    if n > B:
        raise ValueError(f"pack_f32: {n} dialogues exceed batch B={B}")
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs])
    lens = (ctypes.c_int32 * n)(*[a.shape[0] for a in arrs])
    out = np.empty((B, L, D), dtype=np.float32)
    lib.pack_f32(ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), lens,
                 n, B, L, D, out.ctypes.data_as(ctypes.c_void_p))
    return out


def pack_masks_labels(labels: List[np.ndarray], B: int, L: int):
    lib = _load()
    if lib is None:
        return None
    n = len(labels)
    labels = [np.ascontiguousarray(a, dtype=np.int32) for a in labels]
    for i, a in enumerate(labels):
        if a.ndim != 1:
            raise ValueError(f"pack_masks_labels: labels[{i}] has shape "
                             f"{a.shape}, expected 1-D")
        if a.shape[0] > L:
            raise ValueError(f"pack_masks_labels: labels[{i}] length "
                             f"{a.shape[0]} exceeds bucket L={L}")
    if n > B:
        raise ValueError(f"pack_masks_labels: {n} dialogues exceed batch B={B}")
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in labels])
    lens = (ctypes.c_int32 * n)(*[a.shape[0] for a in labels])
    umask = np.empty((B, L), dtype=np.float32)
    out = np.empty((B, L), dtype=np.int32)
    lib.pack_masks_labels(ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
                          lens, n, B, L,
                          umask.ctypes.data_as(ctypes.c_void_p),
                          out.ctypes.data_as(ctypes.c_void_p))
    return umask, out
