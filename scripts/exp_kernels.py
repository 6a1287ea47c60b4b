"""Micro-experiments for the Schur-path hot spots on TPU.

Compares: batched 3x3 inverse (LU vs closed-form adjugate), batched 3x3
Cholesky (XLA vs closed form), pair reduction (scan+scatter vs one-shot
sorted segment_sum), and the reduced-system solve (triangular solves vs
explicit triangular inverse + matvecs), plus the f64 refinement matvec.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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

# ---- batched 3x3 inverse -------------------------------------------------
n_pt = 54000
A = jax.random.normal(key, (n_pt, 3, 3), jnp.float32)
V = jnp.einsum("nab,ncb->nac", A, A, precision=P) + 3 * jnp.eye(3)


@jax.jit
def inv_lu(V):
    return jnp.linalg.inv(V)


@jax.jit
def inv_adj(V):
    a, b, c = V[:, 0, 0], V[:, 0, 1], V[:, 0, 2]
    d, e, f = V[:, 1, 0], V[:, 1, 1], V[:, 1, 2]
    g, h, i = V[:, 2, 0], V[:, 2, 1], V[:, 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return adj / det[:, None, None]


print(f"inv 3x3 LU        {timeit(inv_lu, V):8.2f} ms")
print(f"inv 3x3 adjugate  {timeit(inv_adj, V):8.2f} ms")
err = jnp.max(jnp.abs(inv_lu(V) - inv_adj(V)))
print(f"  max abs diff {err:.3g}")


# ---- batched 3x3 cholesky ------------------------------------------------
@jax.jit
def chol_xla(V):
    return jnp.linalg.cholesky(V)


@jax.jit
def chol_closed(V):
    a, b, c = V[:, 0, 0], V[:, 1, 0], V[:, 2, 0]
    e, f, i = V[:, 1, 1], V[:, 2, 1], V[:, 2, 2]
    l11 = jnp.sqrt(a)
    l21 = b / l11
    l31 = c / l11
    l22 = jnp.sqrt(e - l21 * l21)
    l32 = (f - l31 * l21) / l22
    l33 = jnp.sqrt(i - l31 * l31 - l32 * l32)
    z = jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([l11, z, z], -1),
        jnp.stack([l21, l22, z], -1),
        jnp.stack([l31, l32, l33], -1),
    ], -2)


print(f"chol 3x3 XLA      {timeit(chol_xla, V):8.2f} ms")
print(f"chol 3x3 closed   {timeit(chol_closed, V):8.2f} ms")
err = jnp.max(jnp.abs(chol_xla(V) - chol_closed(V)))
print(f"  max abs diff {err:.3g}")

# ---- pair reduction ------------------------------------------------------
n_pairs = 864000
n_campair = 10038
n_cb = 6
Y = jax.random.normal(key, (216001, n_cb, 3), jnp.float32)
i1 = jax.random.randint(key, (n_pairs,), 0, 216000, jnp.int32)
i2 = jax.random.randint(jax.random.PRNGKey(1), (n_pairs,), 0, 216000, jnp.int32)
cp = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (n_pairs,), 0,
                                 n_campair, jnp.int32))

pc = 65536
pad = (-n_pairs) % pc
i1p = jnp.pad(i1, (0, pad), constant_values=216000).reshape(-1, pc)
i2p = jnp.pad(i2, (0, pad), constant_values=216000).reshape(-1, pc)
cpp = jnp.pad(cp, (0, pad), constant_values=n_campair).reshape(-1, pc)


@jax.jit
def pairs_scan(Y):
    acc0 = jnp.zeros((n_campair + 1, n_cb, n_cb), jnp.float32)

    def body(acc, chunk):
        a, b, c = chunk
        contrib = jnp.einsum("pac,pbc->pab", Y[a], Y[b], precision=P)
        return acc.at[c].add(contrib), None

    acc, _ = lax.scan(body, acc0, (i1p, i2p, cpp))
    return acc


@jax.jit
def pairs_segsum(Y):
    contrib = jnp.einsum("pac,pbc->pab", Y[i1], Y[i2], precision=P)
    return jax.ops.segment_sum(contrib, cp, num_segments=n_campair + 1,
                               indices_are_sorted=True)


print(f"pairs scan+scatter{timeit(pairs_scan, Y, n=5):8.2f} ms")
print(f"pairs segsum      {timeit(pairs_segsum, Y, n=5):8.2f} ms")
err = jnp.max(jnp.abs(pairs_scan(Y)[:n_campair] - pairs_segsum(Y)[:n_campair]))
print(f"  max abs diff {err:.3g}")

# ---- reduced solve: triangular solves vs explicit inverse ----------------
nc = 8604
M = jax.random.normal(key, (nc, nc), jnp.float32) / np.sqrt(nc)
S = M @ M.T + 2 * jnp.eye(nc)
L = jnp.linalg.cholesky(S)
b = jax.random.normal(key, (nc,), jnp.float32)


@jax.jit
def tri_solve(L, b):
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


@jax.jit
def tri_inv(L):
    return lax.linalg.triangular_solve(
        L, jnp.eye(nc, dtype=jnp.float32), lower=True, left_side=True)


print(f"tri solve (1 rhs) {timeit(tri_solve, L, b, n=5):8.2f} ms")
print(f"tri inverse       {timeit(tri_inv, L, n=3):8.2f} ms")
Linv = tri_inv(L)


@jax.jit
def inv_solve(Linv, b):
    return (b @ Linv) @ Linv.T  # Linv.T @ (Linv @ b) via row-vector forms


print(f"inv matvec solve  {timeit(inv_solve, Linv, b):8.2f} ms")
err = jnp.max(jnp.abs(tri_solve(L, b) - inv_solve(Linv, b)))
print(f"  max abs diff {err:.3g}")

# ---- f64 refinement matvec ------------------------------------------------
S64 = S.astype(jnp.float64)
q = b


@jax.jit
def refine_f64(S64, b, q):
    return b.astype(jnp.float64) - S64 @ q.astype(jnp.float64)


print(f"f64 matvec        {timeit(refine_f64, S64, b, q):8.2f} ms")


@jax.jit
def matvec_f32(S, q):
    return jnp.dot(S, q, precision=P)


print(f"f32 matvec        {timeit(matvec_f32, S, q):8.2f} ms")
