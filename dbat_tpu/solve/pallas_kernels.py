"""Pallas TPU kernels for the bundle hot path.

Two kernels, both drop-in replacements for XLA formulations that
materialize large intermediates in HBM (the reference analogs are the
per-pair outer products in code/test/postcov/icpc_mex.c:1-17 and the
normal-assembly loop in code/bundle/cameramodel/multi_res.m:300-313;
here they are TPU tile-programs instead of C loops):

1. ``fused_bilinear`` — the flat-lane block product (flatsel.py)

       out = (A @ SelL * B @ SelR).reshape(n, d_out, g).sum(-1)

   as one VMEM-resident kernel.  The XLA path materializes two
   (n, g*d_out) select-matmul outputs in HBM (for the S fill-in pair
   products that is ~6x the size of the inputs); the kernel keeps the
   per-tile intermediates in VMEM and writes only the (n, d_out)
   result.  The one-hot select matmuls run on the MXU at HIGHEST
   precision so results are exact in f32 (a one-hot matmul is a column
   gather; full-precision passes copy the values unrounded).

2. ``pair_bucket_acc`` — the S fill-in pair products *plus* the
   within-camera-pair reduction:

       rowsum[r] = sum_{p in bucket r} Y1[p] (x) Y2[p]

   over fixed-capacity buckets of pairs pre-sorted by camera pair.
   The XLA path writes all (n_pairs, nb*nb) per-pair blocks to HBM and
   re-reads them in the segment reduction (~1 GB of traffic per
   iteration at stpierre-C5 scale); the kernel folds the bucket sum
   into the product tile so only the (n_rows, nb*nb) bucket sums ever
   leave VMEM (~16x less).  The remaining bucket-row -> camera-pair
   reduction is a small sorted segment_sum in XLA.

Both kernels are exercised in interpreter mode by tests/test_pallas.py
and bit-checked against the XLA formulation on the real chip by
scripts/check_pallas_tpu.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu imports fail on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

HIGHEST = jax.lax.Precision.HIGHEST


def _slot_major(sel: np.ndarray, d_out: int, g: int) -> np.ndarray:
    """Permute one-hot select columns from iout-major (t = iout*g + j)
    to slot-major (t' = j*d_out + iout) so the kernel can take static
    (d_in, d_out) column slices per g-slot."""
    t = np.arange(d_out * g)
    iout, j = t // g, t % g
    perm = np.empty(d_out * g, np.int64)
    perm[j * d_out + iout] = t
    return sel[:, perm]


def _bilinear_kernel(a_ref, b_ref, sell_ref, selr_ref, out_ref, *, d_out, g):
    a = a_ref[:]
    b = b_ref[:]
    acc = None
    for j in range(g):
        L = jnp.dot(a, sell_ref[:, j * d_out:(j + 1) * d_out],
                    precision=HIGHEST, preferred_element_type=a.dtype)
        R = jnp.dot(b, selr_ref[:, j * d_out:(j + 1) * d_out],
                    precision=HIGHEST, preferred_element_type=b.dtype)
        p = L * R
        acc = p if acc is None else acc + p
    out_ref[:] = acc


def fused_bilinear(Af, Bf, selL, selR, d_out: int, g: int,
                   tile: int = 1024, interpret: bool = False):
    """Fused (A @ SelL * B @ SelR) grouped-sum; selL/selR slot-major
    (d_in, g*d_out). Pads the row count to a tile multiple."""
    n = Af.shape[0]
    n_pad = -(-max(n, 1) // tile) * tile
    if n_pad != n:
        Af = jnp.pad(Af, ((0, n_pad - n), (0, 0)))
        Bf = jnp.pad(Bf, ((0, n_pad - n), (0, 0)))
    kern = partial(_bilinear_kernel, d_out=d_out, g=g)
    mem = {} if _VMEM is None else {"memory_space": _VMEM}
    out = pl.pallas_call(
        kern,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, Af.shape[1]), lambda i: (i, i * 0), **mem),
            pl.BlockSpec((tile, Bf.shape[1]), lambda i: (i, i * 0), **mem),
            pl.BlockSpec((selL.shape[0], selL.shape[1]), lambda i: (i * 0, i * 0),
                         **mem),
            pl.BlockSpec((selR.shape[0], selR.shape[1]), lambda i: (i * 0, i * 0),
                         **mem),
        ],
        out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, i * 0), **mem),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), Af.dtype),
        interpret=interpret,
    )(Af, Bf, selL.astype(Af.dtype), selR.astype(Bf.dtype))
    return out[:n]


def _pair_bucket_kernel(a_ref, b_ref, sell_ref, selr_ref, out_ref, *,
                        d_out, g, cap, rows_per_tile):
    a = a_ref[:]
    b = b_ref[:]
    acc = None
    for j in range(g):
        L = jnp.dot(a, sell_ref[:, j * d_out:(j + 1) * d_out],
                    precision=HIGHEST, preferred_element_type=a.dtype)
        R = jnp.dot(b, selr_ref[:, j * d_out:(j + 1) * d_out],
                    precision=HIGHEST, preferred_element_type=b.dtype)
        p = L * R
        acc = p if acc is None else acc + p
    # Within-bucket reduction: (rows*cap, d_out) -> (rows, d_out).
    out_ref[:] = acc.reshape(rows_per_tile, cap, d_out).sum(axis=1)


def pair_bucket_acc(Y1p, Y2p, selL, selR, d_out: int, g: int, cap: int,
                    rows_per_tile: int = 64, interpret: bool = False):
    """Bucketed pair products: Y1p/Y2p are (n_rows*cap, d_in) pair
    operand rows, buckets of `cap` consecutive pairs share a camera
    pair (padding pairs are all-zero rows). Returns (n_rows, d_out)
    bucket sums. n_rows must be a multiple of rows_per_tile (plan pads
    with dummy rows)."""
    n_pairs, d_in = Y1p.shape
    n_rows = n_pairs // cap
    assert n_rows * cap == n_pairs and n_rows % rows_per_tile == 0, (
        n_pairs, cap, rows_per_tile)
    kern = partial(_pair_bucket_kernel, d_out=d_out, g=g, cap=cap,
                   rows_per_tile=rows_per_tile)
    mem = {} if _VMEM is None else {"memory_space": _VMEM}
    tile = rows_per_tile * cap
    return pl.pallas_call(
        kern,
        grid=(n_rows // rows_per_tile,),
        in_specs=[
            pl.BlockSpec((tile, d_in), lambda i: (i, i * 0), **mem),
            pl.BlockSpec((tile, d_in), lambda i: (i, i * 0), **mem),
            pl.BlockSpec((selL.shape[0], selL.shape[1]), lambda i: (i * 0, i * 0),
                         **mem),
            pl.BlockSpec((selR.shape[0], selR.shape[1]), lambda i: (i * 0, i * 0),
                         **mem),
        ],
        out_specs=pl.BlockSpec((rows_per_tile, d_out), lambda i: (i, i * 0),
                               **mem),
        out_shape=jax.ShapeDtypeStruct((n_rows, d_out), Y1p.dtype),
        interpret=interpret,
    )(Y1p, Y2p, selL.astype(Y1p.dtype), selR.astype(Y2p.dtype))


class PairBucketPlan:
    """Host-side plan for the Pallas S fill-in path: pairs sorted by
    camera pair, padded per camera pair to a multiple of `cap`, bucket
    rows padded to a multiple of `rows_per_tile`.

    Padding pairs index a zero scratch row (index n_obs) so they
    contribute exactly nothing; padding bucket rows reduce into a dump
    segment that is sliced away."""

    def __init__(self, i1, i2, cp_sorted, n_campair: int, n_obs: int,
                 cap: int = 16, rows_per_tile: int = 64):
        i1 = np.asarray(i1)
        i2 = np.asarray(i2)
        cp = np.asarray(cp_sorted)
        assert np.all(np.diff(cp) >= 0), "pairs must be sorted by campair"
        self.cap = cap
        self.rows_per_tile = rows_per_tile
        counts = np.bincount(cp, minlength=n_campair)
        padded = -(-counts // cap) * cap
        n_rows = int(padded.sum()) // cap
        n_rows_pad = -(-max(n_rows, 1) // rows_per_tile) * rows_per_tile
        n_pad_pairs = n_rows_pad * cap

        i1p = np.full(n_pad_pairs, n_obs, dtype=np.int32)
        i2p = np.full(n_pad_pairs, n_obs, dtype=np.int32)
        row_seg = np.full(n_rows_pad, n_campair, dtype=np.int32)
        src0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
        dst0 = np.concatenate([[0], np.cumsum(padded)[:-1]])
        # Vectorized scatter of each campair's pairs into its padded slot.
        idx = np.arange(len(cp)) - src0[cp] + dst0[cp]
        i1p[idx] = i1
        i2p[idx] = i2
        rows_per_cp = padded // cap
        row_seg[: n_rows] = np.repeat(np.arange(n_campair), rows_per_cp)
        self.i1 = jnp.asarray(i1p)
        self.i2 = jnp.asarray(i2p)
        self.row_seg = jnp.asarray(row_seg)
        self.n_campair = n_campair
        self.n_rows_pad = n_rows_pad
        self.pad_ratio = n_pad_pairs / max(len(cp), 1)

    def __call__(self, Yf, selL, selR, d_out, g, interpret=False):
        Yz = jnp.concatenate(
            [Yf, jnp.zeros((1, Yf.shape[1]), Yf.dtype)], axis=0)
        rowsum = pair_bucket_acc(
            Yz[self.i1], Yz[self.i2], selL, selR, d_out, g, self.cap,
            self.rows_per_tile, interpret=interpret)
        acc = jax.ops.segment_sum(
            rowsum, self.row_seg, num_segments=self.n_campair + 1,
            indices_are_sorted=True)
        return acc[: self.n_campair]
