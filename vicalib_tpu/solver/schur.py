"""Structured normal-equations solve: frame elimination via block-tridiagonal
factorization + dense reduced system over shared parameters.

The calibration Hessian has arrow-plus-chain structure: frame blocks (9x9)
couple only to adjacent frames (through IMU factors) and to the small shared
block (extrinsics/intrinsics/IMU params).  The reference hands Ceres a general
sparse problem (vicalibrator.h:641-655) and lets its trust-region solver
factorize it; here the structure is explicit:

  H = [[A,  B ],      A: block-tridiagonal (F blocks of 9x9)
       [B', C ]]      C: dense (S x S), S ~ tens

Schur complement: S_red = C - B' A^-1 B  (psum-reducible across frame shards —
the distributed path in dist/), then a tiny dense solve and back-substitution.
A^-1 applications use block cyclic reduction: O(log F) levels of batched
9x9 solves instead of a 2F-step sequential block-Thomas scan.

Jacobi (diagonal) scaling is applied symmetrically before the solve so the
float32 TPU path stays well-conditioned despite mixed parameter scales
(pixels-per-focal-length vs meters vs radians).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tridiag_solve_seq(D, U, B):
    """Solve the block-tridiagonal system A X = B by sequential block-Thomas.

    A has diagonal blocks ``D`` (F, n, n), super-diagonal blocks ``U``
    (F-1, n, n) (block (k, k+1)), sub-diagonal ``U^T``.  B is (F, n, R).
    O(F) sequential depth — kept as the reference implementation for tests;
    the production path is the parallel ``tridiag_solve`` below (the
    sequential scan of tiny 9x9 ops dominated the whole LM iteration on TPU).
    """
    F = D.shape[0]

    def fwd(carry, inp):
        C_prev, G_prev = carry
        Dk, Uk_prev, Bk = inp
        # L = U_{k-1}^T C_{k-1}^{-1}
        L = jax.scipy.linalg.solve(C_prev, Uk_prev, assume_a="gen").T
        Ck = Dk - L @ Uk_prev
        Gk = Bk - L @ G_prev
        return (Ck, Gk), (Ck, Gk)

    C0, G0 = D[0], B[0]
    (_, _), (Cs, Gs) = jax.lax.scan(fwd, (C0, G0), (D[1:], U, B[1:]))
    Cs = jnp.concatenate([C0[None], Cs], axis=0)
    Gs = jnp.concatenate([G0[None], Gs], axis=0)

    def bwd(x_next, inp):
        Ck, Gk, Uk = inp
        xk = jnp.linalg.solve(Ck, Gk - Uk @ x_next)
        return xk, xk

    x_last = jnp.linalg.solve(Cs[-1], Gs[-1])
    _, xs = jax.lax.scan(bwd, x_last, (Cs[:-1], Gs[:-1], U), reverse=True)
    return jnp.concatenate([xs, x_last[None]], axis=0)


def _spd_solve_small(A, B):
    """Batched SPD solve via fully unrolled Cholesky (no pivoting).

    A: (m, n, n) SPD, B: (m, n, R).  ``jnp.linalg.solve`` lowers to pivoted
    LU, which is slow on TPU for small batched blocks; an unrolled Cholesky
    is ~n^2/2 fused VPU ops over the batch.  Valid here because every block
    is a damped, Jacobi-scaled Gauss-Newton diagonal block (SPD).
    """
    n = A.shape[1]
    # Cholesky: column-by-column, vectorized over the batch
    cols = []                           # L columns, each (m, n)
    for k in range(n):
        a_k = A[:, :, k]                                  # (m, n)
        for j in range(k):
            a_k = a_k - cols[j] * cols[j][:, k:k + 1]
        d = jnp.sqrt(jnp.maximum(a_k[:, k], 1e-30))
        col = a_k / d[:, None]
        # zero the strictly-upper part of this column
        col = jnp.where(jnp.arange(n) >= k, col, 0.0)
        cols.append(col)
    # forward substitution: L Y = B
    y = []
    for k in range(n):
        acc = B[:, k, :]
        for j in range(k):
            acc = acc - cols[j][:, k:k + 1] * y[j]
        y.append(acc / cols[k][:, k:k + 1])
    # back substitution: L^T X = Y
    x = [None] * n
    for k in reversed(range(n)):
        acc = y[k]
        for j in range(k + 1, n):
            acc = acc - cols[k][:, j:j + 1] * x[j]
        x[k] = acc / cols[k][:, k:k + 1]
    return jnp.stack(x, axis=1)                            # (m, n, R)


def _spd_solve_scaled(A, B):
    """Batched SPD solve, robust in float32: symmetrize, Jacobi-rescale to
    unit diagonal, then the unrolled Cholesky.

    The cyclic-reduction levels produce Schur complements of an SPD matrix
    (themselves SPD), but float32 level updates drift slightly asymmetric
    and badly scaled — which is what made a naive unpivoted Cholesky produce
    garbage steps near convergence (pivoted LU papered over it at ~300 us
    per batched solve on TPU: each ``jnp.linalg.solve`` lowers to a
    sequential-pivoting while loop).  Restoring symmetry + unit diagonal
    before the factorization recovers Cholesky's unpivoted stability at
    fused-VPU speed."""
    A = 0.5 * (A + jnp.swapaxes(A, 1, 2))
    d = jnp.maximum(jax.vmap(jnp.diag)(A), 1e-30)
    s = 1.0 / jnp.sqrt(d)                                  # (m, n)
    As = A * s[:, :, None] * s[:, None, :]
    Bs = B * s[:, :, None]
    return _spd_solve_small(As, Bs) * s[:, :, None]


def tridiag_solve(D, U, B):
    """Solve the block-tridiagonal system A X = B by block cyclic reduction.

    Same system as :func:`tridiag_solve_seq` but with O(log F) parallel
    depth: each level eliminates the odd-indexed rows with *batched* n x n
    solves/matmuls (VPU/MXU-friendly), halving the system, then
    back-substitutes up the levels.  Rows are padded to a power of two with
    decoupled identity rows.  Stable for the damped SPD systems produced by
    ``schur_solve`` (CR is a nested-dissection reordering of the Cholesky
    elimination).
    """
    F, n, _ = D.shape
    R = B.shape[2]
    dtype = D.dtype

    if F == 1:
        return jnp.linalg.solve(D, B)

    # row-local couplings: L[i] couples x_{i-1}, Rr[i] couples x_{i+1}
    zero1 = jnp.zeros((1, n, n), dtype)
    L = jnp.concatenate([zero1, jnp.swapaxes(U, 1, 2)], axis=0)
    Rr = jnp.concatenate([U, zero1], axis=0)

    # pad to a power of two with identity rows (decoupled: x_pad = 0)
    Fp = 1 << (F - 1).bit_length()
    pad = Fp - F
    if pad:
        eye = jnp.tile(jnp.eye(n, dtype=dtype)[None], (pad, 1, 1))
        D = jnp.concatenate([D, eye], axis=0)
        L = jnp.concatenate([L, jnp.zeros((pad, n, n), dtype)], axis=0)
        Rr = jnp.concatenate([Rr, jnp.zeros((pad, n, n), dtype)], axis=0)
        B = jnp.concatenate([B, jnp.zeros((pad, n, R), dtype)], axis=0)

    def split(a):
        # even/odd rows via reshape (contiguous), not strided slicing
        m = a.shape[0]
        a2 = a.reshape((m // 2, 2) + a.shape[1:])
        return a2[:, 0], a2[:, 1]

    levels = []
    while D.shape[0] > 1:
        D_e, D_o = split(D)
        L_e, L_o = split(L)
        R_e, R_o = split(Rr)
        B_e, B_o = split(B)
        # one batched SPD solve for everything the odd rows contribute
        sol = _spd_solve_scaled(D_o, jnp.concatenate([L_o, R_o, B_o],
                                                     axis=2))
        DiL, DiR, DiB = sol[:, :, :n], sol[:, :, n:2 * n], sol[:, :, 2 * n:]
        levels.append((DiL, DiR, DiB))
        # odd row j-1 (global 2j-1) terms, shifted into kept-row alignment
        znn = jnp.zeros((1, n, n), dtype)
        DiL_m = jnp.concatenate([znn, DiL[:-1]], axis=0)
        DiR_m = jnp.concatenate([znn, DiR[:-1]], axis=0)
        DiB_m = jnp.concatenate([jnp.zeros((1, n, R), dtype), DiB[:-1]],
                                axis=0)
        D = D_e - L_e @ DiR_m - R_e @ DiL
        B = B_e - L_e @ DiB_m - R_e @ DiB
        newL = -(L_e @ DiL_m)
        newR = -(R_e @ DiR)
        L, Rr = newL, newR

    x = _spd_solve_scaled(D, B)

    for DiL, DiR, DiB in reversed(levels):
        # x currently holds the even rows of this level's system
        x_e = x
        x_next = jnp.concatenate([x_e[1:], jnp.zeros((1, n, R), dtype)],
                                 axis=0)
        x_o = DiB - DiL @ x_e - DiR @ x_next
        # interleave evens/odds via stack+reshape (no strided scatter)
        x = jnp.stack([x_e, x_o], axis=1).reshape(-1, n, R)

    return x[:F]


def schur_solve(D, U, Hfs, Hss, gf, gs, damping=0.0):
    """Solve H dx = -g for the arrow-plus-chain system.

    Args:
      D: (F, 9, 9) frame diagonal blocks; U: (F-1, 9, 9) super-diagonal;
      Hfs: (F, 9, S) frame-shared coupling; Hss: (S, S); gf: (F, 9); gs: (S,).
      damping: Levenberg-Marquardt lambda; diagonal entries are scaled by
        (1 + lambda) with an absolute floor, applied before the solve.

    Returns (dx_f (F, 9), dx_s (S,), pred_red) where ``pred_red`` is the
    model-predicted cost reduction 0.5 (lambda dx' Ddiag dx - g' dx) used by
    the gain-ratio damping policy.
    """
    F, n, _ = D.shape
    S = Hss.shape[0]
    dtype = D.dtype

    # -- LM damping on the diagonal (Marquardt scaling with absolute floor)
    eye_n = jnp.eye(n, dtype=dtype)
    eye_S = jnp.eye(S, dtype=dtype)
    floor = jnp.asarray(1e-9, dtype)
    d0f = jnp.maximum(jax.vmap(jnp.diag)(D), floor)      # (F, 9) undamped
    d0s = jnp.maximum(jnp.diag(Hss), floor)              # (S,)
    g0f, g0s = gf, gs
    D = D + (damping * jax.vmap(jnp.diag)(d0f) + floor * eye_n)
    Hss = Hss + damping * jnp.diag(d0s) + floor * eye_S

    # -- Jacobi scaling for conditioning
    df = jax.vmap(jnp.diag)(D)                       # (F, 9)
    ds = jnp.diag(Hss)                               # (S,)
    sf = 1.0 / jnp.sqrt(jnp.maximum(df, 1e-12))
    ss = 1.0 / jnp.sqrt(jnp.maximum(ds, 1e-12))
    D = D * sf[:, :, None] * sf[:, None, :]
    U = U * sf[:-1][:, :, None] * sf[1:][:, None, :]
    Hfs = Hfs * sf[:, :, None] * ss[None, None, :]
    Hss = Hss * ss[:, None] * ss[None, :]
    gf = gf * sf
    gs = gs * ss

    # -- eliminate frames
    rhs = jnp.concatenate([Hfs, gf[:, :, None]], axis=2)    # (F, 9, S+1)
    X = tridiag_solve(D, U, rhs)                            # A^-1 [B, gf]
    BtX = jnp.einsum("fis,fit->st", Hfs, X)                 # (S, S+1)
    S_red = Hss - BtX[:, :S]
    rhs_red = -gs + BtX[:, S]
    # SPD reduced system: Cholesky custom call beats pivoted LU's
    # sequential while loop on TPU
    S_sym = 0.5 * (S_red + S_red.T)
    chol = jnp.linalg.cholesky(S_sym)
    dx_s = jax.scipy.linalg.cho_solve((chol, True), rhs_red)
    dx_f = -X[:, :, S] - jnp.einsum("fis,s->fi", X[:, :, :S], dx_s)
    dx_f = dx_f * sf
    dx_s = dx_s * ss

    # predicted model reduction 0.5 (lambda dx' Ddiag dx - g' dx) in the
    # original (unscaled) coordinates — the LM gain-ratio denominator
    g_dot = jnp.sum(g0f * dx_f) + jnp.sum(g0s * dx_s)
    damp_quad = damping * (jnp.sum(d0f * dx_f * dx_f)
                           + jnp.sum(d0s * dx_s * dx_s))
    pred_red = 0.5 * (damp_quad - g_dot)
    return dx_f, dx_s, pred_red
