"""Levenberg-Marquardt driver over the structured calibration problem.

Replaces the reference's Ceres DOGLEG trust-region solve
(vicalibrator.h:141-152, 952-974) with a jitted LM iteration: assemble the
arrow-plus-chain normal equations, Schur-eliminate frames, damped solve,
manifold retraction, accept/reject with lambda adaptation.  Convergence
criteria mirror the reference: function tolerance 1e-6 (solver_options_,
:149 / vicalib-task.cc:23-24), gradient-norm early stop at 1e-9 (:713-718),
max iterations 200 (vicalib-engine.cc:94).

Stage switching happens through masks and 0/1 gates passed as *data*, so one
compiled step serves every stage.
"""
from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .assemble import ProblemData, assemble, robust_costs
from .problem import CalibState, retract
from .schur import schur_solve

log = logging.getLogger("vicalib_tpu.solver")


@dataclasses.dataclass
class LMOptions:
    max_iters: int = 200
    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-9
    lam0: float = 1e-4
    lam_up: float = 4.0
    lam_down: float = 3.0
    lam_min: float = 1e-12
    lam_max: float = 1e10


@dataclasses.dataclass
class LMInfo:
    cost: float
    iterations: int
    gradient_norm: float
    converged: bool
    cam_rmse: np.ndarray     # per-camera sqrt(cost_c / n_obs_c), Ceres-style
    n_residuals: int


class LMSolver:
    """Holds jitted step/cost functions for one ProblemData instance."""

    def __init__(self, data: ProblemData, options: LMOptions = LMOptions()):
        self.data = data
        self.options = options
        self._step = jax.jit(self._step_impl)
        self._cost = jax.jit(self._cost_impl)

    def _cost_impl(self, state, weight_sqrt, inertial_scale, rotation_only):
        return robust_costs(state, self.data, weight_sqrt, inertial_scale,
                            rotation_only)

    def _step_impl(self, state, lam, weight_sqrt, fmask, smask,
                   inertial_scale, rotation_only):
        D, U, Hfs, Hss, gf, gs, cost, _ = assemble(
            state, self.data, weight_sqrt, fmask, smask, inertial_scale,
            rotation_only)
        dxf, dxs = schur_solve(D, U, Hfs, Hss, gf, gs, damping=lam)
        dxf = dxf * fmask
        dxs = dxs * smask
        trial = retract(state, self.data.layout, dxf, dxs)
        trial_cost, _, _ = robust_costs(
            trial, self.data, weight_sqrt, inertial_scale, rotation_only)
        accept = trial_cost < cost
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), trial, state)
        opts = self.options
        new_lam = jnp.where(
            accept,
            jnp.maximum(lam / opts.lam_down, opts.lam_min),
            jnp.minimum(lam * opts.lam_up, opts.lam_max))
        gnorm = jnp.sqrt(jnp.sum(gf * gf) + jnp.sum(gs * gs))
        step_norm = jnp.sqrt(jnp.sum(dxf * dxf) + jnp.sum(dxs * dxs))
        return new_state, new_lam, cost, trial_cost, accept, gnorm, step_norm

    def solve(self, state: CalibState, fmask, smask, weight_fn=None,
              inertial_scale=0.0, rotation_only=False, seed_weight=None,
              callback=None):
        """Run LM to convergence.  ``weight_fn(state) -> (K,9,9)`` recomputes
        the IMU whitening each iteration (UpdateImuWeights per-iteration
        behavior, vicalibrator.h:690-692); ``seed_weight`` is used when
        weight_fn is None (the I*500 seed, :616)."""
        opts = self.options
        dtype = state.t_wk.dtype
        K = len(self.data.imu.start) if self.data.imu is not None else 1
        if seed_weight is None:
            seed_weight = jnp.tile(jnp.eye(9, dtype=dtype) * 500.0, (K, 1, 1))
        lam = jnp.asarray(opts.lam0, dtype)
        inertial_scale = jnp.asarray(inertial_scale, dtype)
        rotation_only = jnp.asarray(rotation_only, bool)

        cost_prev = None
        it = 0
        gnorm = np.inf
        converged = False
        n_accepted = 0
        for it in range(1, opts.max_iters + 1):
            W = weight_fn(state) if weight_fn is not None else seed_weight
            state, lam, cost, trial_cost, accept, gnorm, step_norm = \
                self._step(state, lam, W, fmask, smask, inertial_scale,
                           rotation_only)
            cost, trial_cost = float(cost), float(trial_cost)
            accept = bool(accept)
            gnorm = float(gnorm)
            if callback:
                callback(it, cost, trial_cost, accept, gnorm)
            log.debug("it %3d cost %.6e -> %.6e %s lam %.1e |g| %.2e",
                      it, cost, trial_cost, "acc" if accept else "rej",
                      float(lam), gnorm)
            if accept:
                n_accepted += 1
                if (cost - trial_cost) < opts.function_tolerance * cost:
                    converged = True
                    break
                cost_prev = trial_cost
            if gnorm > 0 and gnorm < opts.gradient_tolerance:
                converged = True
                break
            if float(lam) >= opts.lam_max:
                converged = True  # cannot make progress; treat as done
                break

        W = weight_fn(state) if weight_fn is not None else seed_weight
        final_cost, cam_sq, cam_cnt = self._cost(
            state, W, inertial_scale, rotation_only)
        cam_sq = np.asarray(cam_sq)
        cam_cnt = np.maximum(np.asarray(cam_cnt), 1.0)
        # Ceres-style per-camera "rmse": sqrt((1/2 sum |r|^2) / n_blocks)
        # (vicalibrator.h:959-971, Problem::Evaluate cost = 1/2 sum r^2)
        cam_rmse = np.sqrt(0.5 * cam_sq / cam_cnt)
        info = LMInfo(cost=float(final_cost), iterations=it,
                      gradient_norm=gnorm, converged=converged,
                      cam_rmse=cam_rmse, n_residuals=int(np.sum(cam_cnt)))
        return state, info
