"""Multi-chip calibration: sharded normal-equation assembly.

Design (SURVEY.md section 2's distribution plan): residual + Jacobian
evaluation — the dominant cost, embarrassingly parallel over observations and
IMU factors — is sharded across a 1-D device mesh with ``shard_map``; the
assembled arrow-plus-chain system (a few MB even at 10k frames) is reduced
with ``psum`` and the structured Schur solve runs replicated.  This is the
frame-sharding / distributed-Schur analog of data parallelism: compute scales
with devices, collectives ride ICI, and the tiny reduced system stays local.

The frame-state arrays are replicated (they are O(F * 9) floats); only the
heavy per-observation / per-factor arrays are partitioned.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.assemble import ProblemData, assemble, robust_costs
from ..solver.problem import retract
from ..solver.residuals import CameraObs, ImuFactors
from ..solver.schur import schur_solve
from .mesh import SHARD_AXIS, make_mesh, pad_to_multiple


def shard_problem_arrays(data: ProblemData, mesh) -> ProblemData:
    """Lay out a ProblemData for SPMD execution of the *fused* staged solver.

    The per-observation and per-IMU-factor arrays (the heavy, embarrassingly
    parallel axes) are padded to a device-count multiple and placed with
    ``NamedSharding(P(SHARD_AXIS))`` on their leading axis; the solver code is
    unchanged — jit's SPMD partitioner shards the residual/Jacobian math and
    inserts the cross-device reductions for the ``segment_sum``/``einsum``
    contractions that the explicit ``ShardedLMStep`` path issues as psums.
    Padded observation rows carry valid=0; padded IMU factors has_meas=False
    (both produce exactly zero residuals and Jacobians).
    """
    import jax

    n = mesh.devices.size
    sh = NamedSharding(mesh, P(SHARD_AXIS))

    def put(a, pad_spec):
        return jax.device_put(pad_to_multiple(np.asarray(a), n), sh)

    obs = [CameraObs(frame_idx=put(o.frame_idx, n),
                     p_w=put(o.p_w, n), p_c=put(o.p_c, n),
                     valid=put(o.valid, n)) for o in data.obs]
    imu = None
    if data.imu is not None:
        im = data.imu
        imu = ImuFactors(
            win_times=put(im.win_times, n), win_gyro=put(im.win_gyro, n),
            win_accel=put(im.win_accel, n), start=put(im.start, n),
            end=put(im.end, n), has_meas=put(im.has_meas, n),
            frame_i=put(im.frame_i, n))
    return ProblemData(obs=obs, imu=imu, layout=data.layout,
                       n_frames=data.n_frames)


def shard_problem(data: ProblemData, n_shards: int) -> list[ProblemData]:
    """Split observations and IMU factors into n contiguous shards.

    Each shard is a ProblemData over the SAME frame set (frame arrays are
    replicated); shard k holds 1/n of each camera's observations and 1/n of
    the IMU factors.  Rows are padded with invalid entries to equal size.
    """
    shards = []
    for k in range(n_shards):
        obs_k = []
        for obs in data.obs:
            N = len(obs.frame_idx)
            per = -(-N // n_shards)
            sl = slice(min(k * per, N), min((k + 1) * per, N))
            pad = per - (sl.stop - sl.start)
            obs_k.append(CameraObs(
                frame_idx=np.pad(obs.frame_idx[sl], (0, pad)),
                p_w=np.pad(obs.p_w[sl], ((0, pad), (0, 0))),
                p_c=np.pad(obs.p_c[sl], ((0, pad), (0, 0))),
                valid=np.pad(obs.valid[sl], (0, pad)),
            ))
        imu_k = None
        if data.imu is not None:
            K = len(data.imu.start)
            per = -(-K // n_shards)
            sl = slice(min(k * per, K), min((k + 1) * per, K))
            pad = per - (sl.stop - sl.start)

            def padk(a, extra_dims):
                return np.pad(a[sl], ((0, pad),) + ((0, 0),) * extra_dims)

            imu_k = ImuFactors(
                win_times=padk(data.imu.win_times, 1),
                win_gyro=padk(data.imu.win_gyro, 2),
                win_accel=padk(data.imu.win_accel, 2),
                start=padk(data.imu.start, 0),
                end=padk(data.imu.end, 0),
                has_meas=np.pad(data.imu.has_meas[sl], (0, pad),
                                constant_values=False),
                frame_i=padk(data.imu.frame_i, 0),
            )
        shards.append(ProblemData(obs=obs_k, imu=imu_k, layout=data.layout,
                                  n_frames=data.n_frames))
    return shards


@dataclasses.dataclass
class ShardedArrays:
    """Leading-axis-stacked shard arrays ((n_shards, ...) per field)."""
    obs_frame_idx: list
    obs_p_w: list
    obs_p_c: list
    obs_valid: list
    imu: dict | None


def stack_shards(shards: list[ProblemData]) -> ShardedArrays:
    C = len(shards[0].obs)
    obs_fi = [np.stack([s.obs[c].frame_idx for s in shards]) for c in range(C)]
    obs_pw = [np.stack([s.obs[c].p_w for s in shards]) for c in range(C)]
    obs_pc = [np.stack([s.obs[c].p_c for s in shards]) for c in range(C)]
    obs_v = [np.stack([s.obs[c].valid for s in shards]) for c in range(C)]
    imu = None
    if shards[0].imu is not None:
        imu = {f: np.stack([getattr(s.imu, f) for s in shards])
               for f in ("win_times", "win_gyro", "win_accel", "start", "end",
                         "has_meas", "frame_i")}
    return ShardedArrays(obs_fi, obs_pw, obs_pc, obs_v, imu)


class ShardedLMStep:
    """One jitted LM step with mesh-sharded assembly.

    Weight matrices for IMU factors are passed sharded alongside the factor
    arrays.  The step function signature matches LMSolver._step_impl but runs
    the assembly under shard_map with psum reduction.
    """

    def __init__(self, data: ProblemData, mesh=None, n_shards=None):
        self.mesh = mesh if mesh is not None else make_mesh(n_shards)
        self.n_shards = self.mesh.devices.size
        self.layout = data.layout
        self.n_frames = data.n_frames
        self.has_imu = data.imu is not None
        self.base = data
        self.shards = shard_problem(data, self.n_shards)
        self.stacked = stack_shards(self.shards)
        self._step = None

    def _shard_data_pytree(self):
        s = self.stacked
        tree = {"fi": s.obs_frame_idx, "pw": s.obs_p_w, "pc": s.obs_p_c,
                "v": s.obs_valid}
        if s.imu is not None:
            tree["imu"] = s.imu
        return tree

    def _local_problem(self, tree):
        obs = [CameraObs(frame_idx=tree["fi"][c], p_w=tree["pw"][c],
                         p_c=tree["pc"][c], valid=tree["v"][c])
               for c in range(len(tree["fi"]))]
        imu = None
        if "imu" in tree:
            d = tree["imu"]
            imu = ImuFactors(win_times=d["win_times"], win_gyro=d["win_gyro"],
                             win_accel=d["win_accel"], start=d["start"],
                             end=d["end"], has_meas=d["has_meas"],
                             frame_i=d["frame_i"])
        return ProblemData(obs=obs, imu=imu, layout=self.layout,
                           n_frames=self.n_frames)

    def make_step(self):
        mesh = self.mesh
        data_tree = jax.tree_util.tree_map(jnp.asarray,
                                           self._shard_data_pytree())
        shard_spec = jax.tree_util.tree_map(lambda _: P(SHARD_AXIS), data_tree)

        def local_assemble(state, weight_sqrt, fmask, smask, inertial_scale,
                           rotation_only, tree):
            # strip the leading shard axis added by shard_map
            tree = jax.tree_util.tree_map(lambda a: a[0], tree)
            if weight_sqrt is not None and self.has_imu:
                weight_sqrt = weight_sqrt[0]
            local = self._local_problem(tree)
            D, U, Hfs, Hss, gf, gs, cost, _ = assemble(
                state, local, weight_sqrt, fmask, smask, inertial_scale,
                rotation_only)
            # reduce everything across shards (frames replicated)
            red = lambda x: jax.lax.psum(x, SHARD_AXIS)
            return red(D), red(U), red(Hfs), red(Hss), red(gf), red(gs), \
                red(cost)

        def local_cost(state, weight_sqrt, inertial_scale, rotation_only,
                       tree):
            tree = jax.tree_util.tree_map(lambda a: a[0], tree)
            if weight_sqrt is not None and self.has_imu:
                weight_sqrt = weight_sqrt[0]
            local = self._local_problem(tree)
            cost, cam_sq, cam_cnt = robust_costs(
                state, local, weight_sqrt, inertial_scale, rotation_only)
            red = lambda x: jax.lax.psum(x, SHARD_AXIS)
            return red(cost), red(cam_sq), red(cam_cnt)

        wspec = P(SHARD_AXIS) if self.has_imu else P()

        assemble_sharded = jax.shard_map(
            local_assemble, mesh=mesh,
            in_specs=(P(), wspec, P(), P(), P(), P(), shard_spec),
            out_specs=P(), check_vma=False)
        cost_sharded = jax.shard_map(
            local_cost, mesh=mesh,
            in_specs=(P(), wspec, P(), P(), shard_spec),
            out_specs=P(), check_vma=False)

        layout = self.layout

        @jax.jit
        def step(state, lam, weight_sqrt, fmask, smask, inertial_scale,
                 rotation_only):
            D, U, Hfs, Hss, gf, gs, cost = assemble_sharded(
                state, weight_sqrt, fmask, smask, inertial_scale,
                rotation_only, data_tree)
            dxf, dxs, _ = schur_solve(D, U, Hfs, Hss, gf, gs, damping=lam)
            dxf = dxf * fmask
            dxs = dxs * smask
            trial = retract(state, layout, dxf, dxs)
            trial_cost, _, _ = cost_sharded(
                trial, weight_sqrt, inertial_scale, rotation_only, data_tree)
            accept = trial_cost < cost
            new_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), trial, state)
            new_lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                                jnp.minimum(lam * 4.0, 1e10))
            return new_state, new_lam, cost, trial_cost, accept

        self._step = step
        return step

    def sharded_weight(self, weight_sqrt):
        """Reshape (K, 9, 9) weights to the sharded (n, K/n, 9, 9) layout."""
        if weight_sqrt is None or not self.has_imu:
            return weight_sqrt  # replicated (unused without IMU factors)
        K = len(self.base.imu.start)
        per = -(-K // self.n_shards)
        pad = self.n_shards * per - K
        w = jnp.concatenate(
            [weight_sqrt,
             jnp.tile(jnp.eye(9, dtype=weight_sqrt.dtype)[None],
                      (pad, 1, 1))], axis=0)
        return w.reshape(self.n_shards, per, 9, 9)
