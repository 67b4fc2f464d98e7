"""Minimal repro for the XLA:TPU frame-major fault (v5e, jax 0.9).

Symptom (BASELINE.md r4): a fused program containing the frame-major
(F, P, ...) geometry chains at F >= ~10k compiles and "succeeds", but the
NEXT program executed on the device dies with a kernel fault
(UNAVAILABLE: TPU worker process crashed).  Everything is clean at
F = 8192; the flat per-observation paths never trigger it.  The
production guard is FRAME_MAJOR_MAX_F = 8192 (solver/residuals.py).

This script isolates the trigger so the workaround can be retired when
the toolchain fixes it:

    python tools/xla_fault_repro.py --f 10240            # expect fault
    python tools/xla_fault_repro.py --f 8192             # expect clean
    python tools/xla_fault_repro.py --f 10240 --probe    # run probe matrix

It builds ONLY the analytic-Gram assembly (reproj_frame_gram_fast) on
random data, runs it once, then runs a trivial second program; exit code
0 + "CLEAN" means the device survived, a JaxRuntimeError on the second
program is the fault.
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
    args = ap.parse_args()
    run_once(args.f, args.p, args.chunk, args.path)


if __name__ == "__main__":
    main()
