"""Split the pair-reduction cost and test a bucketed-gather design.

The S fill-in is sum over 864k observation pairs of (6,3)@(3,6) blocks
segment-reduced into ~10k camera-pair blocks. Candidates:
  A) current: scan over chunks, einsum + scatter-add
  B) one-shot einsum + sorted segment_sum
  C) einsum, then bucket rows by camera pair (host-precomputed gather
     indices into the sorted contrib array), dense sum over the bucket
     axis, small final segment-sum over bucket rows.
Also: pieces in isolation, and linalg.inv under the HIGHEST-precision
context (the profile showed 51 ms there vs 0.06 ms bare).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dbat_tpu.solve.precision import with_highest_precision


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


P = jax.lax.Precision.HIGHEST
key = jax.random.PRNGKey(0)

n_obs = 216000
n_pairs = 864000
n_campair = 10038
n_cb = 6
Y = jax.random.normal(key, (n_obs + 1, n_cb, 3), jnp.float32)
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.integers(0, n_obs, n_pairs), jnp.int32)
i2 = jnp.asarray(rng.integers(0, n_obs, n_pairs), jnp.int32)
# Sorted camera-pair ids with realistic run-length distribution.
cp_np = np.sort(rng.integers(0, n_campair, n_pairs)).astype(np.int32)
cp = jnp.asarray(cp_np)


@jax.jit
def einsum_only(Y):
    return jnp.einsum("pac,pbc->pab", Y[i1], Y[i2], precision=P)


contrib = einsum_only(Y)


@jax.jit
def scatter_only(contrib):
    return jax.ops.segment_sum(contrib, cp, num_segments=n_campair + 1,
                               indices_are_sorted=True)


print(f"einsum+gathers    {timeit(einsum_only, Y, n=5):8.2f} ms")
print(f"sorted segsum     {timeit(scatter_only, contrib, n=5):8.2f} ms")

# ---- C) bucketed gather --------------------------------------------------
B = 128
starts = np.flatnonzero(np.diff(cp_np, prepend=-1))
lens = np.diff(np.append(starts, n_pairs))
rows_per = -(-lens // B)
row_cp = np.repeat(np.arange(len(starts)), rows_per)
row_start = np.concatenate([
    starts[k] + B * np.arange(rows_per[k]) for k in range(len(starts))
])
n_rows = len(row_cp)
slot = row_start[:, None] + np.arange(B)[None, :]
valid = slot < (starts[np.searchsorted(starts, row_start, "right") - 1]
                + lens[np.searchsorted(starts, row_start, "right") - 1])[:, None]
slot = np.where(valid, slot, n_pairs)  # padded position
gidx = jnp.asarray(slot.reshape(-1), jnp.int32)
row_cp_j = jnp.asarray(row_cp, jnp.int32)
print(f"n_rows={n_rows} (bucket B={B})")


@jax.jit
def bucketed(contrib):
    cpad = jnp.concatenate(
        [contrib, jnp.zeros((1, n_cb, n_cb), jnp.float32)], axis=0)
    g = cpad[gidx].reshape(n_rows, B, n_cb, n_cb)
    rowsum = jnp.sum(g, axis=1)
    return jax.ops.segment_sum(rowsum, row_cp_j,
                               num_segments=n_campair + 1,
                               indices_are_sorted=True)


print(f"bucketed reduce   {timeit(bucketed, contrib, n=5):8.2f} ms")
err = jnp.max(jnp.abs(bucketed(contrib)[:n_campair]
                      - scatter_only(contrib)[:n_campair]))
print(f"  max abs diff {err:.3g}")


@jax.jit
def fused_bucketed(Y):
    return bucketed(einsum_only(Y))


print(f"einsum+bucketed   {timeit(fused_bucketed, Y, n=5):8.2f} ms")

# ---- inv under precision context ------------------------------------------
n_pt = 54000
A = jax.random.normal(key, (n_pt, 3, 3), jnp.float32)
V = jnp.einsum("nab,ncb->nac", A, A, precision=P) + 3 * jnp.eye(3)

inv_hp = jax.jit(with_highest_precision(jnp.linalg.inv))
print(f"inv 3x3 HP ctx    {timeit(inv_hp, V):8.2f} ms")

chol_hp = jax.jit(with_highest_precision(jnp.linalg.cholesky))
print(f"chol 3x3 HP ctx   {timeit(chol_hp, V):8.2f} ms")
