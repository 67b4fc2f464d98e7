"""Structured-solve unit tests: cyclic reduction vs block-Thomas vs dense."""
import jax.numpy as jnp
import numpy as np
import pytest

from vicalib_tpu.solver.schur import (schur_solve, tridiag_solve,
                                      tridiag_solve_seq)


def _random_tridiag(F, n=9, R=4, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(F, n, n))
    D = D @ D.transpose(0, 2, 1) + 5 * np.eye(n)   # SPD, well-conditioned
    U = 0.3 * rng.normal(size=(max(F - 1, 0), n, n))
    B = rng.normal(size=(F, n, R))
    A = np.zeros((F * n, F * n))
    for k in range(F):
        A[k * n:(k + 1) * n, k * n:(k + 1) * n] = D[k]
    for k in range(F - 1):
        A[k * n:(k + 1) * n, (k + 1) * n:(k + 2) * n] = U[k]
        A[(k + 1) * n:(k + 2) * n, k * n:(k + 1) * n] = U[k].T
    return D, U, B, A


@pytest.mark.parametrize("F", [1, 2, 3, 5, 8, 17, 192])
def test_cyclic_reduction_matches_dense(F):
    D, U, B, A = _random_tridiag(F)
    X_dense = np.linalg.solve(A, B.reshape(F * 9, -1))
    X_cr = np.asarray(tridiag_solve(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(B))).reshape(F * 9, -1)
    np.testing.assert_allclose(X_cr, X_dense, atol=1e-8)
    if F > 1:
        X_seq = np.asarray(tridiag_solve_seq(
            jnp.asarray(D), jnp.asarray(U),
            jnp.asarray(B))).reshape(F * 9, -1)
        np.testing.assert_allclose(X_seq, X_dense, atol=1e-8)


def test_schur_solve_matches_dense():
    F, n, S = 7, 9, 12
    rng = np.random.default_rng(3)
    D, U, _, A = _random_tridiag(F, n=n, R=1, seed=3)
    Hfs = 0.2 * rng.normal(size=(F, n, S))
    M = rng.normal(size=(S, S))
    Hss = M @ M.T + 5 * np.eye(S)
    gf = rng.normal(size=(F, n))
    gs = rng.normal(size=(S,))
    lam = 1e-3

    # dense damped reference: (H + lam*diag(H)) dx = -g
    H = np.zeros((F * n + S, F * n + S))
    H[:F * n, :F * n] = A
    H[:F * n, F * n:] = Hfs.reshape(F * n, S)
    H[F * n:, :F * n] = Hfs.reshape(F * n, S).T
    H[F * n:, F * n:] = Hss
    g = np.concatenate([gf.reshape(-1), gs])
    Hd = H + lam * np.diag(np.maximum(np.diag(H), 1e-9)) \
        + 1e-9 * np.eye(len(g))
    dx_dense = np.linalg.solve(Hd, -g)

    dxf, dxs, pred = schur_solve(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(Hfs), jnp.asarray(Hss),
        jnp.asarray(gf), jnp.asarray(gs), damping=lam)
    dx = np.concatenate([np.asarray(dxf).reshape(-1), np.asarray(dxs)])
    np.testing.assert_allclose(dx, dx_dense, atol=1e-8)

    # gain-ratio denominator: 0.5 (lam dx' Ddiag dx - g' dx) > 0 at a
    # non-stationary point
    d0 = np.maximum(np.diag(H), 1e-9)
    pred_ref = 0.5 * (lam * np.sum(d0 * dx_dense ** 2) - g @ dx_dense)
    np.testing.assert_allclose(float(pred), pred_ref, rtol=1e-6)
    assert float(pred) > 0
