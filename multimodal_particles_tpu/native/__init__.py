"""Native (C++) host-side kernels, loaded through ctypes.

The reference's only native dependency is fastjet (C++), used for the
substructure observables (reference: data/particle_clouds/jets.py:204-303).
This package provides the framework's own native implementation with a
build-on-first-use cache and a pure-numpy fallback."""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "substructure.cpp")
_LIB = os.path.join(_HERE, "libsubstructure.so")

_lib = None
_tried = False


def _build():
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_substructure_lib():
    """Return the ctypes handle, building the .so on first use.
    Returns None when no C++ toolchain is available."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.substructure_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # pt
            ctypes.POINTER(ctypes.c_double),  # eta
            ctypes.POINTER(ctypes.c_double),  # phi
            ctypes.POINTER(ctypes.c_uint8),  # mask
            ctypes.c_int,  # B
            ctypes.c_int,  # N
            ctypes.c_double,  # R
            ctypes.c_double,  # beta
            ctypes.c_int,  # min_constituents
            ctypes.POINTER(ctypes.c_double),  # tau1
            ctypes.POINTER(ctypes.c_double),  # tau2
            ctypes.POINTER(ctypes.c_double),  # tau3
            ctypes.POINTER(ctypes.c_double),  # d2
            ctypes.POINTER(ctypes.c_uint8),  # valid
        ]
        lib.substructure_batch.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def substructure_batch_native(pt, eta, phi, mask, R=0.8, beta=1.0, min_constituents=3):
    """C++ batch substructure; returns dict or None if the lib is missing."""
    lib = load_substructure_lib()
    if lib is None:
        return None

    pt = np.ascontiguousarray(pt, dtype=np.float64)
    eta = np.ascontiguousarray(eta, dtype=np.float64)
    phi = np.ascontiguousarray(phi, dtype=np.float64)
    mask = np.ascontiguousarray(np.asarray(mask) > 0, dtype=np.uint8)
    B, N = pt.shape
    tau1 = np.empty(B)
    tau2 = np.empty(B)
    tau3 = np.empty(B)
    d2 = np.empty(B)
    valid = np.empty(B, dtype=np.uint8)

    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.substructure_batch(
        dptr(pt),
        dptr(eta),
        dptr(phi),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B,
        N,
        R,
        beta,
        min_constituents,
        dptr(tau1),
        dptr(tau2),
        dptr(tau3),
        dptr(d2),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return {
        "tau1": tau1,
        "tau2": tau2,
        "tau3": tau3,
        "d2": d2,
        "valid": valid.astype(bool),
    }
