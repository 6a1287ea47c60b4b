"""Experiments: segment reductions and gathers on TPU for the
assembly path (what the U/V/W 36 ms actually consists of)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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
n_obs, n_pt, n_img, R = 216000, 54000, 1434, 4

Vblk = jax.random.normal(key, (n_obs, 3, 3), jnp.float32)
Ublk = jax.random.normal(key, (n_obs, 6, 6), jnp.float32)
obs_pt = jnp.asarray(np.repeat(np.arange(n_pt), R), jnp.int32)   # sorted
rng = np.random.default_rng(0)
obs_img_np = rng.integers(0, n_img, n_obs).astype(np.int32)       # unsorted
obs_img = jnp.asarray(obs_img_np)


@jax.jit
def v_seg_sorted(Vblk):
    return jax.ops.segment_sum(Vblk, obs_pt, num_segments=n_pt,
                               indices_are_sorted=True)


@jax.jit
def v_seg_unsorted_flag(Vblk):
    return jax.ops.segment_sum(Vblk, obs_pt, num_segments=n_pt)


@jax.jit
def v_reshape(Vblk):
    return Vblk.reshape(n_pt, R, 3, 3).sum(axis=1)


print(f"V seg (sorted=True)  {timeit(v_seg_sorted, Vblk):8.2f} ms")
print(f"V seg (no hint)      {timeit(v_seg_unsorted_flag, Vblk):8.2f} ms")
print(f"V reshape-sum        {timeit(v_reshape, Vblk):8.2f} ms")
err = jnp.max(jnp.abs(v_seg_sorted(Vblk) - v_reshape(Vblk)))
print(f"  diff {err:.3g}")


@jax.jit
def u_seg(Ublk):
    return jax.ops.segment_sum(Ublk, obs_img, num_segments=n_img)


print(f"U seg (unsorted)     {timeit(u_seg, Ublk):8.2f} ms")

# Image-bucketed dense reduction: static (rows, cap) gather.
cap = 64
order = np.argsort(obs_img_np, kind="stable")
sid = obs_img_np[order]
starts = np.flatnonzero(np.diff(sid, prepend=-1))
lens = np.diff(np.append(starts, n_obs))
rows_idx = []
rows_seg = []
for k in range(len(starts)):
    for off in range(0, lens[k], cap):
        chunk = order[starts[k] + off: starts[k] + min(off + cap, lens[k])]
        pad = np.full(cap, n_obs, np.int64)
        pad[: len(chunk)] = chunk
        rows_idx.append(pad)
        rows_seg.append(sid[starts[k]])
gidx = jnp.asarray(np.array(rows_idx), jnp.int32)
rseg = jnp.asarray(np.array(rows_seg), jnp.int32)
print(f"n_rows={gidx.shape[0]} cap={cap}")


@jax.jit
def u_bucketed(Ublk):
    Upad = jnp.concatenate([Ublk, jnp.zeros((1, 6, 6), jnp.float32)])
    g = Upad[gidx]                      # (rows, cap, 6, 6)
    rowsum = g.sum(axis=1)
    return jax.ops.segment_sum(rowsum, rseg, num_segments=n_img,
                               indices_are_sorted=True)


print(f"U bucketed           {timeit(u_bucketed, Ublk):8.2f} ms")
err = jnp.max(jnp.abs(u_seg(Ublk) - u_bucketed(Ublk)))
print(f"  diff {err:.3g}")

# Raw random row gather cost for reference (216k rows of 144B).
perm = jnp.asarray(rng.permutation(n_obs), jnp.int32)


@jax.jit
def raw_gather(Ublk):
    return Ublk[perm]


print(f"raw gather 216k x144B{timeit(raw_gather, Ublk):8.2f} ms")


# One-hot matmul variant for per-image reduction: images one-hot over a
# CHUNK of obs at a time to bound the one-hot size.
@jax.jit
def u_matmul(Ublk):
    flat = Ublk.reshape(n_obs, 36)
    chunk = 27000
    out = jnp.zeros((n_img, 36), jnp.float32)
    for s in range(0, n_obs, chunk):
        ids = jax.lax.dynamic_slice(obs_img, (s,), (chunk,))
        oh = jax.nn.one_hot(ids, n_img, dtype=jnp.bfloat16, axis=0)
        blk = jax.lax.dynamic_slice(flat, (s, 0), (chunk, 36))
        out = out + jnp.dot(oh, blk.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    return out.reshape(n_img, 6, 6)


print(f"U one-hot matmul     {timeit(u_matmul, Ublk):8.2f} ms")
err = jnp.max(jnp.abs(u_seg(Ublk) - u_matmul(Ublk))) / jnp.max(jnp.abs(u_seg(Ublk)))
print(f"  rel diff {err:.3g} (bf16 accumulate - reference only)")
