"""ctypes bindings for the native C++ kernels (native/dbat_native.cpp).

The library is built on demand (make -C native) and all entry points
have pure-numpy fallbacks, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = osp.join(osp.dirname(__file__), "..", "..", "native")
    so = osp.join(root, "libdbat_native.so")
    if not osp.exists(so):
        try:
            subprocess.run(["make", "-C", root], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.parse_numeric_table.restype = ctypes.c_long
    lib.parse_numeric_table.argtypes = [
        ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.diag_block_outer.restype = None
    lib.diag_block_outer.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.batch_inv3.restype = ctypes.c_long
    lib.batch_inv3.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.icpc_blocks.restype = None
    lib.icpc_blocks.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_long, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def have_native() -> bool:
    return _load() is not None


def parse_numeric_table(path: str, ncols: int, comment: str = "#",
                        max_rows: int = None) -> np.ndarray:
    """Fast text table parse -> (n, ncols) float64; numpy fallback."""
    lib = _load()
    if lib is None:
        return np.atleast_2d(
            np.genfromtxt(path, delimiter=",", comments=comment)
        )
    if max_rows is None:
        with open(path, "rb") as fh:
            max_rows = sum(1 for _ in fh) + 1
    out = np.empty((max_rows, ncols), dtype=np.float64)
    nc = ctypes.c_long(0)
    n = lib.parse_numeric_table(
        path.encode(), comment.encode(), _ptr(out), max_rows, ncols,
        ctypes.byref(nc),
    )
    if n < 0:
        raise ValueError(f"parse_numeric_table failed on {path}: code {n}")
    if nc.value != ncols:
        raise ValueError(
            f"{path}: expected {ncols} columns, found {nc.value}"
        )
    return out[:n]


def diag_block_outer(A: np.ndarray, B: np.ndarray, n: int) -> np.ndarray:
    """Diagonal (n,n) blocks of B' A B; (m,n,n) for m = B.shape[1]//n."""
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    k = A.shape[0]
    m = B.shape[1] // n
    lib = _load()
    if lib is None:
        AB = A @ B
        out = np.empty((m, n, n))
        for j in range(m):
            s = slice(j * n, (j + 1) * n)
            out[j] = B[:, s].T @ AB[:, s]
        return out
    out = np.empty((m, n, n), dtype=np.float64)
    lib.diag_block_outer(_ptr(A), _ptr(B), k, m, n, _ptr(out))
    return out


def batch_inv3(A: np.ndarray) -> np.ndarray:
    A = np.ascontiguousarray(A, dtype=np.float64)
    lib = _load()
    if lib is None:
        return np.linalg.inv(A)
    out = np.empty_like(A)
    rc = lib.batch_inv3(_ptr(A), A.shape[0], _ptr(out))
    if rc != 0:
        raise np.linalg.LinAlgError(f"singular 3x3 block {rc - 1}")
    return out


def icpc_blocks(Vinv: np.ndarray, Y: np.ndarray, s2: float) -> np.ndarray:
    """COP blocks from Vinv (m,3,3) and backsolved columns Y (k,3m)."""
    Vinv = np.ascontiguousarray(Vinv, dtype=np.float64)
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    m = Vinv.shape[0]
    k = Y.shape[0]
    lib = _load()
    if lib is None:
        Yr = Y.reshape(k, m, 3)
        G = np.einsum("kja,kjb->jab", Yr, Yr)
        return s2 * (Vinv + np.einsum("jab,jbc,jcd->jad", Vinv, G, Vinv))
    out = np.empty((m, 3, 3), dtype=np.float64)
    lib.icpc_blocks(_ptr(Vinv), _ptr(Y), k, m, float(s2), _ptr(out))
    return out
