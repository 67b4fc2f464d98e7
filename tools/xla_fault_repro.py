"""Minimal repro for the XLA:TPU frame-major fault (v5e, jax 0.9).

Symptom (BASELINE.md r4): a fused program containing the frame-major
(F, P, ...) geometry chains at F >= ~10k compiles and "succeeds", but the
NEXT program executed on the device dies with a kernel fault
(UNAVAILABLE: TPU worker process crashed).  Everything is clean at
F = 8192; the flat per-observation paths never trigger it.  The
production guard is FRAME_MAJOR_MAX_F = 8192 (solver/residuals.py).

MINIMAL REPRO (r5 bisect, real v5e): a TWO-program sequence —

  1. the fused LM solve with UNPADDED frame-major kernels at F = 10240
     (any iteration count; real or random data),
  2. stages.initialize_time_offset (the 129-candidate vmapped-interp
     program over the (F-1, M) IMU windows),

faults the device on program 2.  Run it with the padding workaround
disabled:

    REPRO_SEQ=1 REPRO_INITS=time_offset \
    REPRO_SIM_CACHE=/tmp/vicalib_bench_sim_c5_10240_v1.npz \
    python tools/xla_fault_repro.py --solver --f 10240      # FAULTS

Everything else bisected CLEAN on hardware, which localizes the bug:
  - the bare Gram kernels (+ while-loop wrapper) at F=10240 + a trivial
    follow-up program                               (run_once; CLEAN)
  - ONE fused solve at F=10240 + trivial follow-up  (--solver; CLEAN)
  - the SAME fused solve executed 3x               (REPRO_REPS=3; CLEAN)
  - the 4-stage ARG sequence without init programs (REPRO_SEQ=1; CLEAN)
  - fused solve -> initialize_extrinsic_rotation or
    initialize_velocities                          (REPRO_INITS=...; CLEAN)
  - initialize_time_offset ALONE                   (REPRO_INIT_ONLY; CLEAN)

i.e. the unpadded F=10240 frame-major program leaves device memory in a
state that only the time-offset init program (big gather/interp working
set) trips over.  The production workaround (residuals.frame_major_pad:
pad F to a multiple of 4096) makes the full staged schedule clean and
fast; this script exists so the workaround can be retired when the
toolchain fixes the underlying bug.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(F, P=190, chunk=2048, path="fast"):
    os.environ["VICALIB_GRAM_CHUNK"] = str(chunk)
    os.environ["VICALIB_FRAME_MAJOR_MAX"] = "1000000"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vicalib_tpu.solver.problem import CalibState
    from vicalib_tpu.solver.residuals import (CameraObs,
                                              reproj_frame_gram_fast,
                                              reproj_frame_sq)
    from vicalib_tpu.solver.robust import SoftL1

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    q = rng.normal(size=(F, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    state = CalibState(
        q_wk=jnp.asarray(q), t_wk=jnp.asarray(
            rng.normal(size=(F, 3)).astype(np.float32)),
        v_w=jnp.zeros((F, 3), dtype),
        q_ck=jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype),
        p_ck=jnp.zeros((1, 3), dtype),
        intr=jnp.asarray([[300.0, 300.0, 400.0, 300.0]], dtype),
        g_dir=jnp.zeros(2, dtype), biases=jnp.zeros(6, dtype),
        scales=jnp.ones(6, dtype), time_offset=jnp.asarray(0.0, dtype))
    obs = CameraObs(
        frame_idx=jnp.repeat(jnp.arange(F, dtype=jnp.int32), P),
        p_w=jnp.asarray(rng.normal(size=(F * P, 3)).astype(np.float32)),
        p_c=jnp.asarray(rng.normal(size=(F * P, 2)).astype(np.float32)),
        valid=jnp.ones((F * P,), dtype), points_per_frame=P)
    cmask = jnp.ones((F, 16), dtype)   # per-frame column mask (12 + n_intr)

    if path == "fast":
        body = lambda s: reproj_frame_gram_fast(
            s, obs, 0, "linear", cmask, SoftL1(0.5))
    elif path == "sq":
        body = lambda s: reproj_frame_sq(s, obs, 0, "linear")
    else:
        # "loop": the fused-solver shape — the gram inside a while_loop
        # with carried state (r4: the bare gram at F=10240 is CLEAN; the
        # fault needs the while-loop context)
        def fn_loop(s):
            def step(carry):
                i, t_wk, acc = carry
                s2 = s._replace(t_wk=t_wk)
                sq, G = reproj_frame_gram_fast(s2, obs, 0, "linear",
                                               cmask, SoftL1(0.5))
                dx = jnp.sum(G, axis=(1, 2))[:, None] * 1e-9
                return (i + 1, t_wk + dx, acc + jnp.sum(sq))
            out = jax.lax.while_loop(lambda c: c[0] < 3, step,
                                     (0, s.t_wk, jnp.asarray(0.0, s.t_wk.dtype)))
            return out[2]
        body = None
        fn = jax.jit(fn_loop)
    if body is not None:
        fn = jax.jit(body)
    out = fn(state)
    jax.block_until_ready(out)
    print(f"  program 1 (gram {path}, F={F}, chunk={chunk}): ran")
    # the fault manifests on the NEXT program
    probe = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), dtype))
    jax.block_until_ready(probe)
    print("  program 2 (trivial matmul): ran -> CLEAN")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=10240)
    ap.add_argument("--p", type=int, default=190)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--path", default="fast", choices=["fast", "sq", "loop"])
    ap.add_argument("--solver", action="store_true",
                    help="production-shaped fused_solve repro")
    ap.add_argument("--cams", type=int, default=4)
    ap.add_argument("--no-imu", action="store_true")
    ap.add_argument("--gram", default="fast", choices=["fast", "jvp"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    if args.solver:
        run_solver(args.f, C=args.cams, imu=not args.no_imu,
                   gram=args.gram, max_iters=args.iters)
    else:
        run_once(args.f, args.p, args.chunk, args.path)




def run_solver(F, C=4, imu=True, max_iters=3, gram="fast"):
    """Production-shaped repro: the REAL fused_solve on a random problem.

    This is the configuration that reliably faults at F=10240/9216 (with
    the padding workaround disabled) — use --solver to reproduce, then
    strip components to localize.
    """
    os.environ["VICALIB_FRAME_MAJOR_MAX"] = "1000000"
    os.environ["VICALIB_FRAME_MAJOR_SAFE_MAX"] = "1000000"
    os.environ["_VICALIB_REPRO_NOPAD"] = "1"
    if gram == "jvp":
        os.environ["VICALIB_GRAM"] = "0"
    import jax
    import jax.numpy as jnp
    import numpy as np

    # disable the padding so the faulting shape actually runs
    from vicalib_tpu.solver import residuals as R
    R.FRAME_MAJOR_MAX_F = 10**6

    from vicalib_tpu.solver import StageFlags, frame_mask, shared_mask
    from vicalib_tpu.solver.build import build_problem
    from vicalib_tpu.solver.lm import LMOptions, LMSolver

    sim_cache = os.environ.get("REPRO_SIM_CACHE", "")
    if sim_cache:
        z = np.load(sim_cache)
        frame_times = z["frame_times"][:F]
        pixels = z["pixels"][:C, :F]
        visible = z["visible"][:C, :F]
        p3d = z["points_3d"]
        kw = dict(imu_times=z["imu_times"], gyro=z["gyro"],
                  accel=z["accel"], window_slack=0.05) if imu else {}
        init_poses = True
    else:
        rng = np.random.default_rng(0)
        P = 190
        frame_times = np.arange(F) / 20.0
        pixels = rng.uniform(50, 550, size=(C, F, P, 2))
        visible = np.ones((C, F, P), bool)
        p3d = np.concatenate([rng.uniform(0, 0.25, (P, 2)),
                              np.zeros((P, 1))], 1)
        kw = {}
        if imu:
            M = int(F / 20.0 * 100) + 50
            kw = dict(imu_times=np.arange(M) / 100.0 - 0.1,
                      gyro=rng.normal(size=(M, 3)) * 0.1,
                      accel=rng.normal(size=(M, 3)) * 0.5,
                      window_slack=0.05)
        init_poses = False
    data, state = build_problem(["linear"] * C, frame_times, pixels,
                                visible, p3d, dtype=jnp.float32,
                                init_poses=init_poses, **kw)
    flags = StageFlags(calibrate_imu=imu, inertial_active=imu,
                       rotation_only=False, bias_active=imu,
                       scale_active=imu)
    mode = os.environ.get("REPRO_MODE", "single")
    if mode in ("staged", "staged_sync"):
        from vicalib_tpu.solver import run_staged
        flags0 = StageFlags(calibrate_imu=imu)
        cb = (lambda *a, **k: None) if mode == "staged_sync" else None
        r = run_staged(state, data, flags0, LMOptions(),
                       stats_callback=cb)
        jax.block_until_ready(r.state.t_wk)
        print(f"  program 1 (run_staged[{mode}] F={F} C={C}): ran, "
              f"iters={r.total_iterations}")
    else:
        solver = LMSolver(data, LMOptions(max_iters=max_iters),
                          sigmas=(5.3e-5, 1.9e-3) if imu else None)
        fmask = frame_mask(flags, F, jnp.float32)
        smask = shared_mask(data.layout, flags, jnp.float32)
        reps = int(os.environ.get("REPRO_REPS", "1"))
        seq = os.environ.get("REPRO_SEQ", "")
        if seq:
            # mimic the staged arg sequence without the init programs:
            # visual -> rotation-only -> full+cov -> full+cov(scale mask)
            stage_args = [
                (0.0, False, False, StageFlags(calibrate_imu=True,
                                               inertial_active=False)),
                (1.0, True, False, StageFlags(calibrate_imu=True,
                                              inertial_active=True,
                                              rotation_only=True)),
                (1.0, False, True, StageFlags(calibrate_imu=True,
                                              inertial_active=True,
                                              rotation_only=False,
                                              bias_active=True)),
                (1.0, False, True, StageFlags(calibrate_imu=True,
                                              inertial_active=True,
                                              rotation_only=False,
                                              bias_active=True,
                                              scale_active=True)),
            ]
            st = state
            inits = os.environ.get("REPRO_INITS", "").split(",")
            if os.environ.get("REPRO_INIT_ONLY"):
                from vicalib_tpu.solver import stages as SG
                st = SG.initialize_time_offset(st, solver.data.imu,
                                               max_shift=0.05)
                jax.block_until_ready(st.time_offset)
                print("  init time_offset ALONE: ran")
                probe = jax.jit(lambda a: a @ a)(
                    jnp.ones((128, 128), jnp.float32))
                jax.block_until_ready(probe)
                print("  probe after init-alone: ran -> CLEAN")
                return
            for k, (sc, ro, cov, fl) in enumerate(stage_args):
                if k == 1:
                    from vicalib_tpu.solver import stages as SG
                    if "time_offset" in inits:
                        st = SG.initialize_time_offset(
                            st, solver.data.imu, max_shift=0.05)
                        jax.block_until_ready(st.time_offset)
                        print("  init time_offset: ran")
                    if "extrinsic" in inits:
                        st = SG.initialize_extrinsic_rotation(
                            st, solver.data.imu)
                        jax.block_until_ready(st.q_ck)
                        print("  init extrinsic_rotation: ran")
                    if "velocities" in inits:
                        st = SG.initialize_velocities(st, solver.data.imu)
                        jax.block_until_ready(st.v_w)
                        print("  init velocities: ran")
                fm = frame_mask(fl, F, jnp.float32)
                sm = shared_mask(data.layout, fl, jnp.float32)
                st, info = solver.solve(st, fm, sm, use_cov_weights=cov,
                                        inertial_scale=sc,
                                        rotation_only=ro)
                jax.block_until_ready(st.t_wk)
                print(f"  stage {k} (sc={sc} ro={ro} cov={cov}): ran")
        else:
            for rep in range(reps):
                st, info = solver.solve(state, fmask, smask,
                                        use_cov_weights=imu,
                                        inertial_scale=1.0 if imu else 0.0)
                jax.block_until_ready(st.t_wk)
                print(f"  program 1 rep {rep} (fused_solve F={F} C={C} "
                      f"imu={imu} gram={gram}): ran")
    probe = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.float32))
    jax.block_until_ready(probe)
    print("  program 2 (trivial matmul): ran -> CLEAN")


if __name__ == "__main__":
    main()
