"""Flat-lane block algebra: small block products as select/reduce matmuls.

TPU tiles f32 arrays as (8 sublanes, 128 lanes) on the two minor
dimensions, so batched arrays of tiny blocks — (n, 6, 3) Jacobian
blocks, (n, 6, 6) outer products — are padded up to a full tile per
block (~56x HBM traffic) whenever they are materialized (gathers,
scatters, segment sums, jit boundaries). The reference has no such
concern (MATLAB sparse triplets, SURVEY.md §2.3 multi_res); this is
TPU-specific design.

The fix: keep the batch axis major and flatten the block dims into the
lane axis ((n, 18), (n, 36)), and compute the small bilinear block
products

    out[n, o] = sum_g  A[n, ia(o,g)] * B[n, ib(o,g)]

as two static one-hot "select" matmuls (MXU) plus an elementwise
multiply and a group-reshape sum (VPU):

    out = (A @ SelL * B @ SelR).reshape(n, d_out, g).sum(-1)

The one-hot matmuls are exact in f32, so results match the batched
einsum formulation bit-for-bit up to summation order.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class FlatBilinear:
    """out[n, iout] = sum over terms (ia, ib, iout): A[n,ia] * B[n,ib].

    `terms` is a (T, 3) int array of (ia, ib, iout) with every output
    index appearing the same number of times `g`, grouped contiguously
    (term t writes to iout = t // g). Build with `make_terms`.
    """

    def __init__(self, d_a: int, d_b: int, terms: np.ndarray, d_out: int):
        terms = np.asarray(terms)
        T = len(terms)
        if T % d_out:
            raise ValueError("terms must divide evenly into outputs")
        g = T // d_out
        expect = np.repeat(np.arange(d_out), g)
        if not np.array_equal(terms[:, 2], expect):
            raise ValueError("terms must be grouped contiguously by iout")
        selL = np.zeros((d_a, T), np.float32)
        selL[terms[:, 0], np.arange(T)] = 1.0
        selR = np.zeros((d_b, T), np.float32)
        selR[terms[:, 1], np.arange(T)] = 1.0
        self.selL = jnp.asarray(selL)
        self.selR = jnp.asarray(selR)
        self._sel_np = (selL, selR)
        self.d_out = d_out
        self.g = g
        #: False = XLA path, True = Pallas TPU kernel, "interpret" =
        #: Pallas interpreter (CPU tests). Set by the backend owner.
        self.use_pallas = False
        self.selL_slot = self.selR_slot = None

    def build_slot_sels(self):
        """Materialize the slot-major selects (direct attributes so the
        const-hoisting jit passes them as arguments).  Must run OUTSIDE
        any trace — call when enabling the Pallas path."""
        if self.selL_slot is None:
            from .pallas_kernels import _slot_major

            self.selL_slot = jnp.asarray(
                _slot_major(self._sel_np[0], self.d_out, self.g))
            self.selR_slot = jnp.asarray(
                _slot_major(self._sel_np[1], self.d_out, self.g))

    def slot_major_sels(self):
        """(selL, selR) permuted slot-major for the Pallas kernels.

        Safe to call lazily even under a trace: build_slot_sels only
        converts host numpy constants via jnp.asarray, which yields
        concrete arrays (never tracers), so caching cannot leak."""
        if self.selL_slot is None:
            self.build_slot_sels()
        return self.selL_slot, self.selR_slot

    def __call__(self, Af, Bf):
        if self.use_pallas:
            from .pallas_kernels import fused_bilinear

            sL, sR = self.slot_major_sels()
            return fused_bilinear(
                Af, Bf, sL, sR, self.d_out, self.g,
                interpret=self.use_pallas == "interpret")
        L = Af @ self.selL.astype(Af.dtype)
        R = Bf @ self.selR.astype(Bf.dtype)
        prod = L * R
        n = prod.shape[0]
        return prod.reshape(n, self.d_out, self.g).sum(axis=-1)


def matmul_terms(m: int, k: int, p: int, row_major_out: bool = True):
    """Terms for flat C = A @ B with A (n, m, k), B (n, k, p) blocks.

    A flattened row-major (m*k), B (k*p), C (m*p): C[a,c] = sum_b
    A[a,b] B[b,c]."""
    a, c, b = np.meshgrid(np.arange(m), np.arange(p), np.arange(k),
                          indexing="ij")
    ia = (a * k + b).ravel()
    ib = (b * p + c).ravel()
    iout = (a * p + c).ravel()
    return np.stack([ia, ib, iout], axis=1)


def abt_terms(m: int, k: int, p: int):
    """Terms for flat C = A @ B^T with A (n, m, k), B (n, p, k) blocks:
    C[a,c] = sum_b A[a,b] B[c,b]; C flattened (m*p)."""
    a, c, b = np.meshgrid(np.arange(m), np.arange(p), np.arange(k),
                          indexing="ij")
    ia = (a * k + b).ravel()
    ib = (c * k + b).ravel()
    iout = (a * p + c).ravel()
    return np.stack([ia, ib, iout], axis=1)


def ata_terms(k: int, m: int):
    """Terms for flat C = A^T @ A with A (n, k, m) blocks, C (m*m):
    C[a,b] = sum_t A[t,a] A[t,b]."""
    a, b, t = np.meshgrid(np.arange(m), np.arange(m), np.arange(k),
                          indexing="ij")
    ia = (t * m + a).ravel()
    ib = (t * m + b).ravel()
    iout = (a * m + b).ravel()
    return np.stack([ia, ib, iout], axis=1)


def atb_terms(k: int, m: int, p: int):
    """Terms for flat C = A^T @ B with A (n, k, m), B (n, k, p):
    C[a,b] = sum_t A[t,a] B[t,b]; C flattened (m*p)."""
    a, b, t = np.meshgrid(np.arange(m), np.arange(p), np.arange(k),
                          indexing="ij")
    ia = (t * m + a).ravel()
    ib = (t * p + b).ravel()
    iout = (a * p + b).ravel()
    return np.stack([ia, ib, iout], axis=1)


def slotpair_abt_terms(slots_a, slots_b, m: int, k: int, slot_stride: int):
    """Terms for per-slot-pair products on a packed (n, r*m*k) array.

    For each pair index q, computes C_q = A_{slots_a[q]} @ A_{slots_b[q]}^T
    where slot s occupies columns [s*slot_stride, s*slot_stride + m*k)
    flattened row-major (m, k). Output (n, len(slots)*m*m... ) uses
    blocks of m*m per pair, pairs contiguous."""
    slots_a = np.asarray(slots_a)
    slots_b = np.asarray(slots_b)
    base = abt_terms(m, k, m)  # within-slot (ia, ib, iout), m x m out
    T0 = len(base)
    out = []
    for q, (sa, sb) in enumerate(zip(slots_a, slots_b)):
        t = base.copy()
        t[:, 0] += sa * slot_stride
        t[:, 1] += sb * slot_stride
        t[:, 2] += q * m * m
        out.append(t)
    return np.concatenate(out, axis=0)
