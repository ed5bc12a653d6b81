"""ctypes bindings for the native host runtime (marshal.c, gmp_baseline.c).

Builds on first use with the in-tree Makefile (plain cc, mirroring the
reference's single-command build, ref makefile:7-8).  All entry points
degrade gracefully to the numpy paths in ops/limb.py when no C toolchain is
present; `available()` reports which backend is active."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libmarshal.so"], cwd=_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_DIR, "libmarshal.so")
    if not os.path.exists(path) and not _build():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.digits_from_bytes.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), ctypes.c_size_t,
    ]
    lib.bytes_from_digits.restype = ctypes.c_int
    lib.bytes_from_digits.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), ctypes.c_size_t,
        ctypes.c_char_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def digits_from_bytes(buf: bytes, L: int) -> np.ndarray:
    """Little-endian byte buffer -> canonical int32 digit vector of length L."""
    lib = _load()
    out = np.empty(L, np.int32)
    if lib is None:
        raw = buf[: 2 * L].ljust(2 * L, b"\0")
        out[:] = np.frombuffer(raw, dtype="<u2").astype(np.int32)
        return out
    lib.digits_from_bytes(buf, len(buf), out, L)
    return out


def bytes_from_digits(d: np.ndarray) -> bytes:
    """Canonical digit vector -> little-endian bytes (2 per digit)."""
    d = np.ascontiguousarray(d, np.int32)
    lib = _load()
    if lib is None:
        return d.astype("<u2").tobytes()
    out = ctypes.create_string_buffer(2 * len(d))
    rc = lib.bytes_from_digits(d, len(d), out)
    if rc != 0:
        raise ValueError("digits not canonical")
    return out.raw


def gmp_mul(a: bytes, b: bytes) -> bytes | None:
    """Exact product of two little-endian magnitude byte buffers via GMP's
    assembly mpn_mul -- the fast host oracle for verifying device products
    (CPython's multiply takes ~1.5h at 10^9 bits; this takes ~20s).
    None if the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gmp_mul_bytes"):
        return None
    lib.gmp_mul_bytes.restype = ctypes.c_int
    out = ctypes.create_string_buffer(len(a) + len(b))
    rc = lib.gmp_mul_bytes(a, len(a), b, len(b), out)
    return out.raw if rc == 0 else None


def gmp_baseline(bits: int, reps: int = 3) -> dict | None:
    """Run the GMP mpn_mul timing harness; None if it can't build/run
    (no toolchain or no libgmp)."""
    import json

    exe = os.path.join(_DIR, "gmp_baseline")
    if not os.path.exists(exe):
        try:
            subprocess.run(
                ["make", "-s", "gmp_baseline"], cwd=_DIR, check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        out = subprocess.run(
            [exe, str(bits), str(reps)], capture_output=True, timeout=600, check=True
        )
        return json.loads(out.stdout)
    except Exception:
        return None
