"""Experiment: flat-lane (n, d) block algebra vs batched (n, a, b) einsums.

Hypothesis: arrays with tiny trailing dims (3/6) are tile-padded ~56x
on TPU; flattening blocks into the lane axis and expressing the small
block products as static select/reduce matmuls recovers the bandwidth.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dbat_tpu.solve.precision import with_highest_precision

N_OBS = 216000
N_PT = 54000
R = 4
N_IMG = 1434
N_CAMPAIR = 4302


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def pairprod_mats(dims_a, dims_b, contract, dtype=jnp.float32):
    """Static matrices for out[n, o] = sum_c A[n, ia] * B[n, ib].

    A has block dims dims_a (flattened row-major), B dims_b; `contract`
    maps (multi-index letters) -> output. Here specialised builders
    below instead; this is a placeholder."""
    raise NotImplementedError


def build_sel(d_in, terms_in):
    """One-hot (d_in, n_terms) selecting column terms_in[t] for term t."""
    m = np.zeros((d_in, len(terms_in)), np.float32)
    m[np.asarray(terms_in), np.arange(len(terms_in))] = 1.0
    return jnp.asarray(m)


def build_red(n_terms, terms_out, d_out):
    m = np.zeros((n_terms, d_out), np.float32)
    m[np.arange(n_terms), np.asarray(terms_out)] = 1.0
    return jnp.asarray(m)


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((N_OBS, 2, 6)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((N_OBS, 2, 3)), jnp.float32)
    Af = A.reshape(N_OBS, 12)
    Bf = B.reshape(N_OBS, 6)

    # ---- U blocks: nka,nkb->nab (k=2, a=b=6) -------------------------
    def u_ein(A):
        return jnp.einsum("nka,nkb->nab", A, A)
    t, U_ref = timeit(jax.jit(with_highest_precision(u_ein)), A)
    print(f"Ublk einsum        {t*1e3:8.2f} ms")

    # flat: out[n, 6a+b] = sum_k A[n,6k+a]*A[n,6k+b]
    ka, aa, bb = np.meshgrid(np.arange(2), np.arange(6), np.arange(6),
                             indexing="ij")
    selL = build_sel(12, (6 * ka + aa).ravel())
    selR = build_sel(12, (6 * ka + bb).ravel())
    red = build_red(2 * 36, np.tile((6 * aa[0] + bb[0]).ravel(), 2), 36)

    def u_flat(Af):
        L = Af @ selL
        Rm = Af @ selR
        return (L * Rm) @ red
    t, U_flat = timeit(jax.jit(with_highest_precision(u_flat)), Af)
    err = jnp.abs(U_flat.reshape(N_OBS, 6, 6) - U_ref).max()
    print(f"Ublk flat matmul   {t*1e3:8.2f} ms   err={err:.2e}")

    # ---- segment-sum by image (bucketed) on (n,36) vs (n,6,6) --------
    from dbat_tpu.solve.segsum import SegSum
    obs_img = rng.integers(0, N_IMG, N_OBS)
    obs_img.sort()
    seg = SegSum(obs_img, N_IMG)

    t, s_ref = timeit(jax.jit(lambda d: seg(d)), U_ref)
    print(f"img segsum (n,6,6) {t*1e3:8.2f} ms")
    t, s_flat = timeit(jax.jit(lambda d: seg(d)), U_flat)
    err = jnp.abs(s_flat.reshape(N_IMG, 6, 6) - s_ref).max()
    print(f"img segsum (n,36)  {t*1e3:8.2f} ms   err={err:.2e}")

    # ---- pair products per point ------------------------------------
    Y = jnp.asarray(rng.standard_normal((N_OBS, 6, 3)), jnp.float32)
    Yf = Y.reshape(N_OBS, 18)
    idx = np.arange(N_OBS).reshape(N_PT, R)
    a_s, b_s = np.triu_indices(R, k=1)  # 6 slot pairs

    def pair_ein(Y):
        Yg = Y[jnp.asarray(idx)]
        return jnp.einsum("jsac,jsbc->jsab", Yg[:, a_s], Yg[:, b_s])
    t, P_ref = timeit(jax.jit(with_highest_precision(pair_ein)), Y)
    print(f"pair einsum        {t*1e3:8.2f} ms")

    # flat: Yp (n_pt, 72); out[j, s(36)+6a+b] = sum_c Yp[j,18*sa+3a+c]*Yp[j,18*sb+3b+c]
    sa = np.repeat(a_s, 36 * 3)
    sb = np.repeat(b_s, 36 * 3)
    aa2, bb2, cc2 = np.meshgrid(np.arange(6), np.arange(6), np.arange(3),
                                indexing="ij")
    aa2 = np.tile(aa2.ravel(), 6)
    bb2 = np.tile(bb2.ravel(), 6)
    cc2 = np.tile(cc2.ravel(), 6)
    selL2 = build_sel(72, 18 * sa + 3 * aa2 + cc2)
    selR2 = build_sel(72, 18 * sb + 3 * bb2 + cc2)
    st = np.repeat(np.arange(6), 36 * 3)
    red2 = build_red(6 * 36 * 3, 36 * st + 6 * aa2 + bb2, 216)

    def pair_flat(Yf):
        Yp = Yf.reshape(N_PT, 72)
        L = Yp @ selL2
        Rm = Yp @ selR2
        return (L * Rm) @ red2
    t, P_flat = timeit(jax.jit(with_highest_precision(pair_flat)), Yf)
    err = jnp.abs(
        P_flat.reshape(N_PT, 6, 6, 6) - P_ref).max()
    print(f"pair flat matmul   {t*1e3:8.2f} ms   err={err:.2e}")

    # ---- campair segsum on flat (n_pairs, 36) ------------------------
    cp = rng.integers(0, N_CAMPAIR, N_PT * 6)
    segc = SegSum(cp, N_CAMPAIR)
    t, c_ref = timeit(jax.jit(lambda d: segc(d)),
                      P_ref.reshape(-1, 6, 6))
    print(f"campair seg (6,6)  {t*1e3:8.2f} ms")
    t, c_flat = timeit(jax.jit(lambda d: segc(d)),
                       P_flat.reshape(-1, 36))
    err = jnp.abs(c_flat.reshape(N_CAMPAIR, 6, 6) - c_ref).max()
    print(f"campair seg (36)   {t*1e3:8.2f} ms   err={err:.2e}")

    # ---- S scatter: block .at[] vs flat rows + transpose -------------
    nc = N_IMG * 6
    ci1 = rng.integers(0, N_IMG, N_CAMPAIR)
    ci2 = rng.integers(0, N_IMG, N_CAMPAIR)
    img_cols = jnp.asarray(
        (np.arange(N_IMG)[:, None] * 6 + np.arange(6)), jnp.int32)
    acc = c_ref

    def scat_ref(acc):
        icols = img_cols
        S = jnp.zeros((nc + 1, nc + 1), jnp.float32)
        c1 = icols[jnp.asarray(ci1)]
        c2 = icols[jnp.asarray(ci2)]
        S = S.at[c1[:, :, None], c2[:, None, :]].add(-acc)
        S = S.at[c2[:, :, None], c1[:, None, :]].add(
            -jnp.swapaxes(acc, 1, 2))
        return S[:nc, :nc]
    t, S_ref = timeit(jax.jit(scat_ref), acc)
    print(f"S scatter blocks   {t*1e3:8.2f} ms")

    flat_idx1 = jnp.asarray(ci1 * N_IMG + ci2)
    flat_idx2 = jnp.asarray(ci2 * N_IMG + ci1)

    def scat_flat(accf):
        Sf = jnp.zeros((N_IMG * N_IMG, 36), jnp.float32)
        Sf = Sf.at[flat_idx1].add(-accf)
        accT = accf.reshape(-1, 6, 6).swapaxes(1, 2).reshape(-1, 36)
        Sf = Sf.at[flat_idx2].add(-accT)
        S = Sf.reshape(N_IMG, N_IMG, 6, 6).transpose(0, 2, 1, 3)
        return S.reshape(nc, nc)
    t, S_flat = timeit(jax.jit(scat_flat), acc.reshape(-1, 36))
    err = jnp.abs(S_flat - S_ref).max()
    print(f"S scatter flat     {t*1e3:8.2f} ms   err={err:.2e}")


if __name__ == "__main__":
    main()
