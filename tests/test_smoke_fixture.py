"""Checked-in real-data smoke run (VERDICT r4 #8): a fixed PGM+CSV dataset
in the reference's on-disk layout (/root/reference/README.md:34-48) driven
through the engine — guards the file-format surface (P5 AND P2 PGM frames,
device-clock timestamps.txt with an arbitrary epoch, system_times.txt,
two-column IMU timestamp.txt) against regressions independent of the
simulator."""
import json
import os

import numpy as np

from vicalib_tpu.config import VicalibConfig
from vicalib_tpu.geometry import quat_np

ROOT = os.path.join(os.path.dirname(__file__), "data", "vi_smoke")


def test_fixture_files_parse():
    from vicalib_tpu.io import sources

    cam = sources.parse_camera_uri(f"file://{ROOT}/images/*.pgm")
    gt = json.load(open(os.path.join(ROOT, "gt.json")))
    assert cam.n_frames == gt["n_frames"]
    # P2 and P5 frames decode to the same shape/dtype
    f0, f3 = cam.read_batch(0, [0, 3])   # [3] is the ascii P2 frame
    assert f0.shape == f3.shape == (300, 400)
    assert f0.dtype == f3.dtype == np.uint8
    # device clock carries the epoch; system clock is the true time
    assert cam.timestamp(0, system=False) > gt["epoch"] - 1
    assert cam.timestamp(0, system=True) < 10.0
    imu = sources.parse_imu_uri(f"csv://{ROOT}/imu")
    assert imu.times[0] > gt["epoch"] - 1       # two-column: device default
    imu_sys = sources.parse_imu_uri(f"csv://{ROOT}/imu",
                                    use_system_time=True)
    assert imu_sys.times[0] < 1.0


def test_engine_on_checked_in_fixture(tmp_path):
    gt = json.load(open(os.path.join(ROOT, "gt.json")))
    cfg = VicalibConfig(
        cam=f"file://{ROOT}/images/*.pgm",
        imu=f"csv://{ROOT}/imu",
        models="linear",
        use_only_when_static=False,
        calibrate_imu=True,
        use_system_time=False,          # exercise the device-clock path
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
    q_est, t_est = result.stats.t_ck_vec[0]
    dq = quat_np.quat_mul(quat_np.inverse(np.asarray(gt["q_ck"])), q_est)
    assert np.linalg.norm(quat_np.log(dq)) < 5e-3
    # 12 frames at the downscaled smoke resolution bounds translation
    # observability; the full-accuracy gates live in test_engine / bench
    assert np.linalg.norm(t_est - np.asarray(gt["t_ck"])) < 2e-2
    np.testing.assert_allclose(result.stats.cam_intrinsics[0][:4],
                               gt["intrinsics"], atol=5.0)
    assert result.stats.reprojection_error[0] < 0.1
    # both clocks share the epoch, so the refined offset stays near zero
    assert abs(result.stats.ts - gt["time_offset"]) < 2e-3
