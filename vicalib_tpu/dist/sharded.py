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

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..solver.assemble import ProblemData, assemble, robust_costs
from ..solver.lm import LMOptions, candidate_lams, select_candidate
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

    def put(a):
        return jax.device_put(pad_to_multiple(np.asarray(a), n), sh)

    # keep the static fast-path aux data (points_per_frame / consecutive)
    # whenever sharding needs no padding, so SPMD keeps the frame-major
    # MXU assembly path instead of falling back to segment_sum scatters
    obs = [CameraObs(frame_idx=put(o.frame_idx),
                     p_w=put(o.p_w), p_c=put(o.p_c),
                     valid=put(o.valid),
                     points_per_frame=(o.points_per_frame
                                       if len(o.frame_idx) % n == 0
                                       else None))
           for o in data.obs]
    imu = None
    if data.imu is not None:
        im = data.imu
        imu = ImuFactors(
            win_times=put(im.win_times), win_gyro=put(im.win_gyro),
            win_accel=put(im.win_accel), start=put(im.start),
            end=put(im.end), has_meas=put(im.has_meas),
            frame_i=put(im.frame_i),
            consecutive=im.consecutive and len(im.start) % n == 0,
            slack=im.slack)
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
    arrays.  The step runs assembly + per-candidate trial costs under
    shard_map with psum reduction, then feeds them through the SAME
    multi-candidate accept/reject policy as the production solver
    (solver.lm.select_candidate) — the two paths cannot diverge.
    """

    def __init__(self, data: ProblemData, mesh=None, n_shards=None,
                 options: LMOptions = LMOptions()):
        self.options = options
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
        from .multihost import global_shard

        mesh = self.mesh
        # leading-axis sharded placement over the (possibly multi-host) mesh
        data_tree = jax.tree_util.tree_map(
            lambda a: global_shard(mesh, np.asarray(a)),
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

        def local_cost_batched(states_b, weight_sqrt, inertial_scale,
                               rotation_only, tree):
            # states_b: candidate-batched trial states (replicated); cost of
            # each candidate over the LOCAL shard, psum-reduced
            tree = jax.tree_util.tree_map(lambda a: a[0], tree)
            if weight_sqrt is not None and self.has_imu:
                weight_sqrt = weight_sqrt[0]
            local = self._local_problem(tree)
            costs = jax.vmap(
                lambda s: robust_costs(s, local, weight_sqrt, inertial_scale,
                                       rotation_only)[0])(states_b)
            return jax.lax.psum(costs, SHARD_AXIS)

        wspec = P(SHARD_AXIS) if self.has_imu else P()

        assemble_sharded = jax.shard_map(
            local_assemble, mesh=mesh,
            in_specs=(P(), wspec, P(), P(), P(), P(), shard_spec),
            out_specs=P(), check_vma=False)
        cost_sharded = jax.shard_map(
            local_cost_batched, mesh=mesh,
            in_specs=(P(), wspec, P(), P(), shard_spec),
            out_specs=P(), check_vma=False)

        layout = self.layout
        options = self.options

        @jax.jit
        def step_impl(state, lam, nu, weight_sqrt, fmask, smask,
                      inertial_scale, rotation_only, tree):
            with jax.default_matmul_precision("highest"):
                D, U, Hfs, Hss, gf, gs, cost = assemble_sharded(
                    state, weight_sqrt, fmask, smask, inertial_scale,
                    rotation_only, tree)
                lams = candidate_lams(lam, options, cost.dtype)
                dxf_b, dxs_b, pred_b = jax.vmap(
                    lambda l: schur_solve(D, U, Hfs, Hss, gf, gs,
                                          damping=l))(lams)
                trial_b = jax.vmap(
                    lambda df, ds: retract(state, layout, df * fmask,
                                           ds * smask))(dxf_b, dxs_b)
                cost_b = cost_sharded(trial_b, weight_sqrt, inertial_scale,
                                      rotation_only, tree)
                return select_candidate(state, trial_b, cost, cost_b, pred_b,
                                        lams, lam, nu, gf, gs, options)

        def step(state, lam, nu, weight_sqrt, fmask, smask, inertial_scale,
                 rotation_only):
            # data passed as an argument (multi-host arrays span
            # non-addressable devices and cannot be jit-closure constants)
            return step_impl(state, lam, nu, weight_sqrt, fmask, smask,
                             inertial_scale, rotation_only, data_tree)

        self._step = step
        return step

    def sharded_weight(self, weight_sqrt):
        """Reshape (K, 9, 9) weights to the sharded (n, K/n, 9, 9) layout,
        placed over the (possibly multi-host) mesh."""
        from .multihost import global_shard

        if weight_sqrt is None or not self.has_imu:
            return weight_sqrt  # replicated (unused without IMU factors)
        K = len(self.base.imu.start)
        per = -(-K // self.n_shards)
        pad = self.n_shards * per - K
        w = np.concatenate(
            [np.asarray(weight_sqrt),
             np.tile(np.eye(9, dtype=np.asarray(weight_sqrt).dtype)[None],
                     (pad, 1, 1))], axis=0)
        return global_shard(self.mesh,
                            w.reshape(self.n_shards, per, 9, 9))
