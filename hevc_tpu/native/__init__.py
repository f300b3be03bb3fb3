"""Native (C++) runtime components, loaded via ctypes.

hevc_entropy.so: slice-data CABAC encoder, byte-for-byte equal to the
Python entropy layer (parity-tested) but ~100x faster — the host-side
serial stage that overlaps with device compute.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "hevc_entropy.cpp")
_SO = os.path.join(_DIR, "hevc_entropy.so")

_lib = None


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.hevc_encode_slice.restype = ctypes.c_int
    lib.hevc_encode_slice.argtypes = [
        ctypes.POINTER(ctypes.c_int32)] * 5 + [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int] + [
        ctypes.POINTER(ctypes.c_int32)] * 2
    _lib = lib
    return lib


def encode_slice_data(depth8, modes8, coef_y, coef_cb, coef_cr,
                      pad_w: int, pad_h: int, qp: int,
                      modes4=None, nxn8=None) -> bytes:
    """CABAC-encode the slice data; returns byte-aligned RBSP bytes.
    modes4/nxn8: optional intra-NxN decisions (None = all 2Nx2N)."""
    lib = load()

    def as_i32(a):
        return np.ascontiguousarray(a, np.int32)

    d8, m8 = as_i32(depth8), as_i32(modes8)
    cy, cb, cr = as_i32(coef_y), as_i32(coef_cb), as_i32(coef_cr)
    cap = max(1 << 16, cy.size * 4)
    out = np.empty(cap, np.uint8)

    def ptr(a, t=ctypes.c_int32):
        return a.ctypes.data_as(ctypes.POINTER(t))

    null = ctypes.POINTER(ctypes.c_int32)()
    m4 = as_i32(modes4) if modes4 is not None else None
    nx = as_i32(nxn8) if nxn8 is not None else None
    n = lib.hevc_encode_slice(ptr(d8), ptr(m8), ptr(cy), ptr(cb), ptr(cr),
                              pad_w, pad_h, qp,
                              ptr(out, ctypes.c_uint8), cap,
                              ptr(m4) if m4 is not None else null,
                              ptr(nx) if nx is not None else null)
    if n < 0:
        raise RuntimeError("hevc_encode_slice failed (buffer too small?)")
    return out[:n].tobytes()


def encode_slice_data_p(depth8, mvq8, coef_y, coef_cb, coef_cr,
                        pad_w: int, pad_h: int, qp: int,
                        is_b: bool = False) -> bytes:
    """CABAC-encode a P (or low-delay B) slice's data (native)."""
    lib = load()
    if not hasattr(lib, "_p_configured"):
        lib.hevc_encode_slice_p.restype = ctypes.c_int
        lib.hevc_encode_slice_p.argtypes = [
            ctypes.POINTER(ctypes.c_int32)] * 5 + [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib._p_configured = True

    def as_i32(a):
        return np.ascontiguousarray(a, np.int32)

    d8 = as_i32(depth8)
    mv = as_i32(mvq8)
    cy, cb, cr = as_i32(coef_y), as_i32(coef_cb), as_i32(coef_cr)
    cap = max(1 << 16, cy.size * 4)
    out = np.empty(cap, np.uint8)

    def ptr(a, t=ctypes.c_int32):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n = lib.hevc_encode_slice_p(ptr(d8), ptr(mv), ptr(cy), ptr(cb), ptr(cr),
                                pad_w, pad_h, qp,
                                ptr(out, ctypes.c_uint8), cap, int(is_b))
    if n < 0:
        raise RuntimeError("hevc_encode_slice_p failed")
    return out[:n].tobytes()
