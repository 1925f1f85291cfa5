"""ctypes bindings for the native host runtime (libppoc_native).

The shared library is compiled on first use with g++ (no pybind11 in this
image; plain C ABI + ctypes per task constraints) and cached next to the
source.  Everything degrades gracefully: ``available()`` is False when no
compiler exists, and all call sites (tests, checkpoint fast path) fall back
to pure Python.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "ppoc_native.cpp")
_LIB = os.path.join(_HERE, "libppoc_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

ENV_IDS = {"simple": 0, "pendulum": 1, "cartpole": 2, "mountain_car": 3,
           "acrobot": 4, "reacher": 5, "recall": 6, "recall_long": 7,
           "recall_xl": 8, "recall_xxl": 9, "recall_4k": 10, "recall_8k": 11,
           "recall_16k": 12}


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB, "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None

        lib.ppoc_env_state_dim.argtypes = [ctypes.c_int]
        lib.ppoc_env_state_dim.restype = ctypes.c_int
        lib.ppoc_env_obs_dim.argtypes = [ctypes.c_int]
        lib.ppoc_env_obs_dim.restype = ctypes.c_int
        lib.ppoc_env_action_dim.argtypes = [ctypes.c_int]
        lib.ppoc_env_action_dim.restype = ctypes.c_int
        lib.ppoc_env_horizon.argtypes = [ctypes.c_int]
        lib.ppoc_env_horizon.restype = ctypes.c_int

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.ppoc_env_reset.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, f32p, i32p, f32p,
        ]
        lib.ppoc_env_reset.restype = None
        lib.ppoc_env_step.argtypes = [
            ctypes.c_int, ctypes.c_int, f32p, i32p, f32p, f32p, f32p, u8p, u8p,
        ]
        lib.ppoc_env_step.restype = None

        lib.ppoc_crc32.argtypes = [u8p, ctypes.c_int64]
        lib.ppoc_crc32.restype = ctypes.c_uint32
        lib.ppoc_write_blob.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int64]
        lib.ppoc_write_blob.restype = ctypes.c_int
        lib.ppoc_read_blob.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int64]
        lib.ppoc_read_blob.restype = ctypes.c_int64
        lib.ppoc_blob_size.argtypes = [ctypes.c_char_p]
        lib.ppoc_blob_size.restype = ctypes.c_int64

        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Native vectorized env engine (host oracle / host rollout path)
# ---------------------------------------------------------------------------

class NativeVecEnv:
    """``n`` lockstep instances of an in-repo environment, stepped by the C++
    engine.  Host twin of the pure-JAX vectorized envs (ppoc_tpu.envs) — the
    role the reference's CPU env path plays (src/env.c), used as a physics
    oracle in tests and for chip-free debugging."""

    def __init__(self, name: str, n: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable (no g++?)")
        if name not in ENV_IDS:
            raise KeyError(f"no native env '{name}'; have {sorted(ENV_IDS)}")
        self._lib = lib
        self.env_id = ENV_IDS[name]
        self.n = n
        self.state_dim = lib.ppoc_env_state_dim(self.env_id)
        self.obs_dim = lib.ppoc_env_obs_dim(self.env_id)
        self.action_dim = lib.ppoc_env_action_dim(self.env_id)
        self.horizon = lib.ppoc_env_horizon(self.env_id)
        self.states = np.zeros((n, self.state_dim), np.float32)
        self.steps = np.zeros((n,), np.int32)

    def reset(self, seed: int = 0) -> np.ndarray:
        obs = np.zeros((self.n, self.obs_dim), np.float32)
        self._lib.ppoc_env_reset(
            self.env_id, self.n, np.uint64(seed), self.states, self.steps, obs
        )
        return obs

    def set_state(self, states: np.ndarray, steps: Optional[np.ndarray] = None):
        """Force exact physics state (for oracle comparisons)."""
        self.states[:] = np.asarray(states, np.float32).reshape(self.n, self.state_dim)
        if steps is not None:
            self.steps[:] = np.asarray(steps, np.int32).reshape(self.n)

    def step(self, actions: np.ndarray):
        actions = np.ascontiguousarray(actions, np.float32).reshape(self.n, self.action_dim)
        obs = np.zeros((self.n, self.obs_dim), np.float32)
        reward = np.zeros((self.n,), np.float32)
        term = np.zeros((self.n,), np.uint8)
        trunc = np.zeros((self.n,), np.uint8)
        self._lib.ppoc_env_step(
            self.env_id, self.n, self.states, self.steps, actions,
            obs, reward, term, trunc,
        )
        return obs, reward, term.astype(bool), trunc.astype(bool)


# ---------------------------------------------------------------------------
# Checksummed blob I/O (checkpoint fast path)
# ---------------------------------------------------------------------------

def crc32(data: bytes) -> int:
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    if lib is None:
        import zlib
        return zlib.crc32(data) & 0xFFFFFFFF
    return int(lib.ppoc_crc32(np.ascontiguousarray(buf), buf.size))


def write_blob(path: str, data: bytes) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.ascontiguousarray(np.frombuffer(data, np.uint8))
    rc = lib.ppoc_write_blob(path.encode(), buf, buf.size)
    if rc != 0:
        raise IOError(f"ppoc_write_blob({path!r}) failed with code {rc}")


def read_blob(path: str) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    size = lib.ppoc_blob_size(path.encode())
    if size < 0:
        raise IOError(f"ppoc_blob_size({path!r}) failed with code {size}")
    buf = np.zeros((max(int(size), 1),), np.uint8)
    n = lib.ppoc_read_blob(path.encode(), buf, buf.size)
    if n < 0:
        codes = {-1: "open failed", -3: "truncated/corrupt header", -4: "CRC mismatch"}
        raise IOError(f"ppoc_read_blob({path!r}): {codes.get(int(n), n)}")
    return buf[: int(n)].tobytes()
