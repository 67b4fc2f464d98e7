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
A^-1 applications use a block-Thomas factorization (lax.scan over frames).

Jacobi (diagonal) scaling is applied symmetrically before the solve so the
float32 TPU path stays well-conditioned despite mixed parameter scales
(pixels-per-focal-length vs meters vs radians).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tridiag_solve(D, U, B):
    """Solve the block-tridiagonal system A X = B.

    A has diagonal blocks ``D`` (F, n, n), super-diagonal blocks ``U``
    (F-1, n, n) (block (k, k+1)), sub-diagonal ``U^T``.  B is (F, n, R).
    Block-Thomas: sequential over F (tiny 9xR ops per step).
    """
    F = D.shape[0]

    def fwd(carry, inp):
        C_prev, G_prev = carry
        Dk, Uk_prev, Bk = inp
        # L = U_{k-1}^T C_{k-1}^{-1}
        L = jnp.linalg.solve(C_prev, Uk_prev).T.conj() if False else \
            jax.scipy.linalg.solve(C_prev, Uk_prev, assume_a="gen").T
        Ck = Dk - L @ Uk_prev
        Gk = Bk - L @ G_prev
        return (Ck, Gk), (Ck, Gk)

    # pad U with zeros for the first step
    U_pad = jnp.concatenate([jnp.zeros_like(U[:1]), U], axis=0) if U.shape[0] \
        else jnp.zeros((F,) + D.shape[1:], D.dtype)
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


def schur_solve(D, U, Hfs, Hss, gf, gs, damping=0.0):
    """Solve H dx = -g for the arrow-plus-chain system.

    Args:
      D: (F, 9, 9) frame diagonal blocks; U: (F-1, 9, 9) super-diagonal;
      Hfs: (F, 9, S) frame-shared coupling; Hss: (S, S); gf: (F, 9); gs: (S,).
      damping: Levenberg-Marquardt lambda; diagonal entries are scaled by
        (1 + lambda) with an absolute floor, applied before the solve.

    Returns (dx_f (F, 9), dx_s (S,)).
    """
    F, n, _ = D.shape
    S = Hss.shape[0]
    dtype = D.dtype

    # -- LM damping on the diagonal (Marquardt scaling with absolute floor)
    eye_n = jnp.eye(n, dtype=dtype)
    eye_S = jnp.eye(S, dtype=dtype)
    floor = jnp.asarray(1e-9, dtype)
    D = D + (damping * jnp.maximum(
        jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(D)), floor) + floor * eye_n)
    Hss = Hss + damping * jnp.maximum(jnp.diag(jnp.diag(Hss)), floor) \
        + floor * eye_S

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
    dx_s = jnp.linalg.solve(S_red, rhs_red)
    dx_f = -X[:, :, S] - jnp.einsum("fis,s->fi", X[:, :, :S], dx_s)
    return dx_f * sf, dx_s * ss
