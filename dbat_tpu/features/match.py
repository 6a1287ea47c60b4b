"""Pairwise descriptor matching on the MXU.

Unit descriptors make cosine similarity a single (max_kp x d) @
(d x max_kp) matmul per image pair; mutual nearest neighbors with a
Lowe ratio test on the top-2 similarities.  All pairs are matched in
one batched jit call (vmap over the pair axis) — the natural MXU
formulation of the O(pairs * kp^2) matching problem.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def _match_sim(d1, v1, d2, v2, ratio):
    """Match one descriptor set pair; returns (idx2 per kp1, ok mask)."""
    S = d1 @ d2.T  # cosine similarity, (k1, k2)
    S = jnp.where(v1[:, None] & v2[None, :], S, -2.0)
    # Lowe ratio on distance: d^2 = 2 - 2s  =>  require
    # (2-2*s1) < r^2 * (2-2*s2)  with s1 best, s2 runner-up.
    top2, idx = lax.top_k(S, 2)
    s1, s2 = top2[:, 0], top2[:, 1]
    best2 = idx[:, 0]
    d1sq = 2.0 - 2.0 * s1
    d2sq = 2.0 - 2.0 * s2
    pass_ratio = d1sq < (ratio * ratio) * d2sq
    # Mutual nearest: kp1 must also be kp2's best.
    back = jnp.argmax(S, axis=0)  # (k2,)
    mutual = back[best2] == jnp.arange(S.shape[0])
    ok = v1 & pass_ratio & mutual & (s1 > -1.0)
    return best2, ok, s1


def match_pair(desc1, valid1, desc2, valid2, ratio: float = 0.9):
    """Match two images' descriptors.

    Returns (i1, i2) numpy index arrays of matched keypoint slots."""
    best2, ok, _s = _match_sim(jnp.asarray(desc1), jnp.asarray(valid1),
                               jnp.asarray(desc2), jnp.asarray(valid2),
                               jnp.asarray(ratio, jnp.float32))
    okh = np.asarray(ok)
    i1 = np.flatnonzero(okh)
    return i1, np.asarray(best2)[i1]


@partial(jax.jit, static_argnames=())
def _match_all(desc, valid, pi, pj, ratio):
    def one(i, j):
        return _match_sim(desc[i], valid[i], desc[j], valid[j], ratio)

    return jax.vmap(one)(pi, pj)


def match_all_pairs(desc, valid, pairs=None, ratio: float = 0.9):
    """Match every image pair in one batched call.

    desc (n, max_kp, d); valid (n, max_kp); pairs: optional (m, 2) int
    array (default: all n*(n-1)/2 combinations).  Returns a dict
    {(i, j): (i1, i2, sim)} of matched slot indices + similarity per
    pair."""
    n = desc.shape[0]
    if pairs is None:
        pi, pj = np.triu_indices(n, k=1)
        pairs = np.stack([pi, pj], axis=1)
    pairs = np.asarray(pairs)
    best2, ok, s1 = _match_all(jnp.asarray(desc), jnp.asarray(valid),
                               jnp.asarray(pairs[:, 0]),
                               jnp.asarray(pairs[:, 1]),
                               jnp.asarray(ratio, jnp.float32))
    best2 = np.asarray(best2)
    ok = np.asarray(ok)
    s1 = np.asarray(s1)
    out = {}
    for k, (i, j) in enumerate(pairs):
        i1 = np.flatnonzero(ok[k])
        if len(i1):
            out[(int(i), int(j))] = (i1, best2[k][i1], s1[k][i1])
    return out
