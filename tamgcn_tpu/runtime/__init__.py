"""Native (C++) runtime: batched skeleton augmentation via ctypes.

The reference has no native components (SURVEY §2: 100% Python); this is the
framework's native data-plane — the host-side augmentation pipeline compiled
with OpenMP so one host can keep a pod slice fed. Built on demand with g++;
the Python/numpy feeder path remains the always-available fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "augment.cc")
_LIB = os.path.join(_HERE, "libtamgcn_augment.so")
_lock = threading.Lock()
_lib = None

MODALITY = {"joint": 0, "bone": 1, "motion": 2}


def build(force: bool = False) -> str:
    """Compile the native library (idempotent)."""
    with _lock:
        if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                 _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
    return _LIB


def load():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.tamgcn_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # skeletons
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.POINTER(ctypes.c_int64),   # indices
            ctypes.c_int,                     # batch
            ctypes.c_int,                     # V
            ctypes.c_int,                     # t_out
            ctypes.c_int,                     # train
            ctypes.c_int,                     # modality
            ctypes.c_uint64,                  # seed
            ctypes.c_uint64,                  # epoch
            ctypes.POINTER(ctypes.c_float),   # out
        ]
        lib.tamgcn_augment_batch.restype = None
        lib.tamgcn_version.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def augment_batch(
    skeletons: list[np.ndarray],
    indices: np.ndarray,
    *,
    time_steps: int = 52,
    train: bool = False,
    modality: str = "joint",
    seed: int = 0,
    epoch: int = 0,
) -> np.ndarray:
    """Batched native augmentation.

    skeletons: list of (T_i, V, 3) float64 arrays (raw clips);
    indices: per-sample RNG stream ids (dataset indices);
    returns (B, 3, time_steps, V, 1) float32.
    """
    lib = load()
    batch = len(skeletons)
    V = skeletons[0].shape[1]
    lengths = np.array([s.shape[0] for s in skeletons], np.int64)
    offsets = np.zeros(batch + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.ascontiguousarray(
        np.concatenate([s.reshape(-1, V, 3) for s in skeletons]), np.float64
    )
    idx = np.ascontiguousarray(indices, np.int64)
    out = np.empty((batch, 3, time_steps, V), np.float32)
    lib.tamgcn_augment_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch, V, time_steps, int(train), MODALITY[modality],
        seed, epoch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[..., None]
