"""Precomputed static segment reductions for assembly hot loops.

XLA's `segment_sum` lowers to a scatter-add that runs at row
granularity (~15 ms for 216k (6,6) blocks on a v5e), regardless of the
`indices_are_sorted` hint. With the segment id array known at setup we
can lower to strictly cheaper plans:

  * ids == repeat(arange(n_seg), R)  ->  reshape + axis-sum (4x faster)
  * otherwise: bucket the sorted ids into fixed-cap rows, one static
    gather + dense row-sum + a small (mostly-unique) sorted
    segment_sum over rows (2x faster)

Both are exact (f32 sums in the same order class); the generic
segment_sum stays in use on sharded meshes where static global gathers
would defeat GSPMD partitioning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SegSum:
    """Reduction of (n_items, ...) data to (n_seg, ...) by static ids."""

    def __init__(self, ids, n_seg: int, cap: int = 64):
        ids = np.asarray(ids)
        n_items = len(ids)
        self.n_seg = int(n_seg)
        self.n_items = n_items

        R = n_items // n_seg if n_seg and n_items % n_seg == 0 else 0
        if R and np.array_equal(ids, np.repeat(np.arange(n_seg), R)):
            self.mode = "reshape"
            self.R = R
            return

        self.mode = "bucket"
        order = np.argsort(ids, kind="stable")
        sid = ids[order]
        starts = np.flatnonzero(np.diff(sid, prepend=-1))
        lens = np.diff(np.append(starts, n_items))
        n_rows_per = -(-lens // cap)
        n_rows = int(n_rows_per.sum())
        gidx = np.full((n_rows, cap), n_items, dtype=np.int64)
        row_seg = np.empty(n_rows, dtype=np.int64)
        r = 0
        for k in range(len(starts)):
            for off in range(0, lens[k], cap):
                m = min(cap, lens[k] - off)
                gidx[r, :m] = order[starts[k] + off: starts[k] + off + m]
                row_seg[r] = sid[starts[k]]
                r += 1
        self.gidx = jnp.asarray(gidx, jnp.int32)
        self.row_seg = jnp.asarray(row_seg, jnp.int32)

    def __call__(self, data):
        if self.mode == "reshape":
            return data.reshape((self.n_seg, self.R) + data.shape[1:]).sum(
                axis=1)
        pad = jnp.zeros((1,) + data.shape[1:], data.dtype)
        dpad = jnp.concatenate([data, pad], axis=0)
        rowsum = dpad[self.gidx].sum(axis=1)
        return jax.ops.segment_sum(
            rowsum, self.row_seg, num_segments=self.n_seg,
            indices_are_sorted=True,
        )
