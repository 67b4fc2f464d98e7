"""Auxiliary subsystems: tracker tool, visualization, checkpoint/resume,
covariance, model_files preload (-has_initial_guess path)."""
import os

import numpy as np
import pytest

from vicalib_tpu.config import VicalibConfig
from vicalib_tpu.io import sim, sources


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("aux_data")
    img_dir = root / "images"
    imu_dir = root / "imu"
    img_dir.mkdir()
    imu_dir.mkdir()
    cfg = sim.default_mono_config(
        n_frames=12, model="linear", imu=True, imu_rate=100.0,
        distance=0.42, orbit_radius=0.25,
        gyro_bias=np.array([0.01, -0.02, 0.015]))
    cfg.cameras[0].params[:4] = [240.0, 240.0, 200.0, 150.0]
    cfg.cameras[0].width, cfg.cameras[0].height = 400, 300
    data = sim.simulate(cfg)
    imgs = sim.render_frames(data, cam=0)
    for k, img in enumerate(imgs):
        sources.write_pgm(str(img_dir / f"frame_{k:05d}.pgm"), img)
    np.savetxt(str(img_dir / "timestamps.txt"), data.frame_times)
    np.savetxt(str(imu_dir / "accel.txt"), data.accel)
    np.savetxt(str(imu_dir / "gyro.txt"), data.gyro)
    np.savetxt(str(imu_dir / "timestamp.txt"), data.imu_times)
    return root, cfg, data


def test_tracker_tool(dataset, tmp_path, capsys):
    root, cfg, data = dataset
    from vicalib_tpu.tracker import main
    out = tmp_path / "tracker_poses.txt"
    rc = main(["-cam", f"file://{root}/images/*.pgm", "-models", "linear",
               "-output_poses", str(out)])
    assert rc == 0
    captured = capsys.readouterr()
    assert "T_gw" in captured.out
    poses = np.loadtxt(out)
    assert poses.shape[0] >= 10  # tracked most frames
    # tracked camera heights should be sane (distance ~0.42 m)
    assert np.all(np.abs(poses[:, :3]) < 2.0)


def test_viz_svgs(dataset, tmp_path):
    root, cfg, data = dataset
    from vicalib_tpu import viz
    scene = tmp_path / "scene.svg"
    viz.scene_svg(str(scene), cfg.target, data.T_wk[0], data.T_wk[1])
    text = scene.read_text()
    assert "<svg" in text and "circle" in text and "polyline" in text

    det = tmp_path / "det.svg"
    centers = data.pixels[0, 0]
    viz.detection_svg(str(det), (300, 400), centers,
                      np.ones(len(centers), bool))
    assert "<svg" in det.read_text()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from vicalib_tpu.checkpoint import load_checkpoint, save_checkpoint
    from vicalib_tpu.solver import StageFlags
    from vicalib_tpu.solver.problem import init_state

    state = init_state(5, ["poly3"], [640], [480])
    state = state._replace(biases=jnp.arange(6, dtype=jnp.float64))
    flags = StageFlags(calibrate_imu=True, inertial_active=True)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, flags, meta={"stage": "test"})
    state2, flags2, meta = load_checkpoint(path)
    for f in state._fields:
        np.testing.assert_allclose(np.asarray(getattr(state, f)),
                                   np.asarray(getattr(state2, f)))
    assert flags2.calibrate_imu and flags2.inertial_active
    assert meta["stage"] == "test"


def test_covariance_and_checkpoint_in_engine(dataset, tmp_path):
    root, sim_cfg, data = dataset
    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        models="linear",
        calibrate_imu=False,
        output=str(tmp_path / "cameras.xml"),
        output_log_file=str(tmp_path / "vicalibrator.log"),
        compute_covariance=True,
        checkpoint_file=str(tmp_path / "state.npz"),
        report_file=str(tmp_path / "report.html"),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg).run()
    finally:
        os.chdir(cwd)
    assert result.success
    # covariance: positive variances for the active intrinsics entries
    cov = result.result.covariance
    assert cov is not None
    layout_intr0 = 6  # cam0 intrinsics start (single camera)
    fu_var = cov[layout_intr0, layout_intr0]
    assert fu_var > 0
    log_text = (tmp_path / "vicalibrator.log").read_text()
    assert "Camera: 0" in log_text and "covariance" in log_text
    # -report_file: self-contained HTML diagnostic (the Pangolin-GUI
    # replacement) with stage table, error charts, coverage map, sigmas
    report = (tmp_path / "report.html").read_text()
    for needle in ("Calibration report", "Solver stages", "rmse",
                   "Reprojection errors", "<svg", "standard deviations"):
        assert needle in report, needle
    # checkpoint written + loadable
    from vicalib_tpu.checkpoint import load_checkpoint
    state2, flags2, meta = load_checkpoint(str(tmp_path / "state.npz"))
    np.testing.assert_allclose(np.asarray(state2.intr),
                               np.asarray(result.state.intr))


def test_engine_resume_from_checkpoint(dataset, tmp_path):
    """-resume_file: restart the staged solve from a native checkpoint; the
    resumed run must reproduce the full run's result without the early
    stages (no reference analog — the reference has no mid-solve
    checkpointing, SURVEY.md section 5)."""
    root, sim_cfg, data = dataset
    ckpt = str(tmp_path / "state.npz")
    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        imu=f"csv://{root}/imu",
        models="linear", calibrate_imu=True,
        output=str(tmp_path / "cameras.xml"),
        output_log_file="", checkpoint_file=ckpt)
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r1 = VicalibEngine(cfg).run()
        assert r1.success
        cfg2 = VicalibConfig(
            cam=f"file://{root}/images/*.pgm",
            imu=f"csv://{root}/imu",
            models="linear", calibrate_imu=True,
            output=str(tmp_path / "cameras2.xml"),
            output_log_file="", resume_file=ckpt)
        r2 = VicalibEngine(cfg2).run()
    finally:
        os.chdir(cwd)
    assert r2.success
    # resumed from the final checkpointed stage: few extra iterations, and
    # the answer matches the uninterrupted run
    assert r2.result.total_iterations <= r1.result.total_iterations
    np.testing.assert_allclose(np.asarray(r2.state.biases),
                               np.asarray(r1.state.biases), atol=1e-3)
    np.testing.assert_allclose(r2.stats.cam_intrinsics[0][:4],
                               r1.stats.cam_intrinsics[0][:4], atol=0.2)


def test_model_files_resume(dataset, tmp_path):
    """-model_files + -has_initial_guess: preload a previous cameras.xml and
    verify the validation path (vicalib-engine.cc:189-196,
    vicalib-task.cc:843-855)."""
    root, sim_cfg, data = dataset
    first_xml = tmp_path / "first.xml"
    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        models="linear", calibrate_imu=False, output=str(first_xml))
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r1 = VicalibEngine(cfg).run()
        assert r1.success

        cfg2 = VicalibConfig(
            cam=f"file://{root}/images/*.pgm",
            model_files=str(first_xml),
            calibrate_imu=False, has_initial_guess=True,
            output=str(tmp_path / "second.xml"))
        r2 = VicalibEngine(cfg2).run()
    finally:
        os.chdir(cwd)
    assert r2.success
    np.testing.assert_allclose(
        r2.stats.cam_intrinsics[0][:4], r1.stats.cam_intrinsics[0][:4],
        atol=0.2)


def test_report_inertial_block(tmp_path):
    """write_html_report on a VI problem includes the inertial table."""
    import numpy as np

    from vicalib_tpu.io import sim
    from vicalib_tpu.report import write_html_report
    from vicalib_tpu.solver import StageFlags, run_staged
    from vicalib_tpu.solver.build import problem_from_sim
    from vicalib_tpu.utils import CalibrationStats, CalibrationStatus

    cfg = sim.default_mono_config(n_frames=10, model="linear", imu=True,
                                  imu_rate=50.0,
                                  gyro_bias=np.array([0.01, -0.02, 0.015]))
    data_sim = sim.simulate(cfg)
    data, state = problem_from_sim(data_sim, use_imu=True, window_slack=0.1)
    result = run_staged(state, data, StageFlags(calibrate_imu=True))
    stats = CalibrationStats(1, status=CalibrationStatus.SUCCESS)
    path = write_html_report(
        str(tmp_path / "r.html"), ["linear"], result.state, data, result,
        stats, [800], [600])
    text = open(path).read()
    for needle in ("Inertial parameters", "gyro bias", "time offset",
                   "gravity"):
        assert needle in text, needle


def test_status_server_live_endpoint(tmp_path):
    """-status_port: the headless live-GUI analog must serve the latest
    stats snapshot as JSON and the (rewritten-per-chunk) HTML report with
    a refresh header (vicalib-engine.cc:108, 388-432 surface)."""
    import json
    import urllib.request

    from vicalib_tpu.status import StatusServer
    from vicalib_tpu.utils import CalibrationStats, CalibrationStatus

    report = tmp_path / "report.html"
    srv = StatusServer(0, report_path=str(report)).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        # before any stats: starting
        d = json.load(urllib.request.urlopen(base + "/stats.json",
                                             timeout=10))
        assert d["status"] == "starting"
        # publish a snapshot
        stats = CalibrationStats(2, status=CalibrationStatus.OPTIMIZING)
        stats.reprojection_error = [0.05, 0.07]
        stats.num_iterations = 12
        stats.total_mse = 1e-4
        srv.publish(stats)
        d = json.load(urllib.request.urlopen(base + "/stats.json",
                                             timeout=10))
        assert d["status"] == "optimizing"
        assert d["reprojection_error"] == [0.05, 0.07]
        assert d["num_iterations"] == 12
        # no report yet: minimal live page
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"calibration running" in page
        # no scene yet: 404
        import urllib.error
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/scene.svg", timeout=10)
        # publish a live 3-D scene (what streaming chunks push)
        from vicalib_tpu import viz
        from vicalib_tpu.targets.grid import load_preset

        tgt = load_preset("small")
        q = np.tile([0.0, 0.0, 0.0, 1.0], (3, 1))
        t = np.array([[0, 0, -0.4], [0.05, 0, -0.4], [0.1, 0, -0.4]])
        svg = viz.scene_svg(None, tgt, q, t)
        assert svg.startswith("<svg") and "polyline" in svg
        srv.publish_scene(svg)
        body = urllib.request.urlopen(base + "/scene.svg",
                                      timeout=10).read()
        assert body.decode() == svg
        # the fallback live page embeds it
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"/scene.svg" in page
        # once the report exists it is served with a refresh injection
        report.write_text("<html><head></head><body>REPORT</body></html>")
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"REPORT" in page and b"refresh" in page
    finally:
        srv.stop()


def test_large_grid_pattern_generation():
    """24x36 grids cannot have collision-free 4x4 windows (birthday bound:
    ~2800 windows over 2^16 codes), so make_pattern scales the uniqueness
    window to 5x5 there — while the 10x19 presets keep their exact k=4
    patterns (fixtures and printed targets must not change)."""
    import numpy as np

    from vicalib_tpu.targets.grid import (_windows_unique, load_preset,
                                          make_pattern)

    g = load_preset("large").grid
    assert g.shape == (24, 36)
    assert _windows_unique(g, k=5)
    # the classic preset is bit-stable across the k heuristic
    m = make_pattern(10, 19, 71)
    assert _windows_unique(m, k=4)
    assert m.shape == (10, 19) and m.sum() == 104
