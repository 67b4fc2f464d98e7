"""URI driver wrappers: deinterlace:// and rectify:[file=..]// replay.

Reference analog: HAL camera URI drivers (reference README.md:34-42,
src/vicalib-engine.cc:124-144).
"""
import numpy as np
import pytest

from vicalib_tpu.io import sources


def _write_pgms(tmp_path, imgs, sub="images"):
    d = tmp_path / sub
    d.mkdir()
    for k, im in enumerate(imgs):
        sources.write_pgm(str(d / f"f{k:03d}.pgm"), im)
    return str(d / "*.pgm")


def test_deinterlace_splits_fields(tmp_path):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (32, 16), dtype=np.uint8).astype(np.uint8)
            for _ in range(3)]
    glob = _write_pgms(tmp_path, imgs)
    src = sources.parse_camera_uri(f"deinterlace://file://{glob}")
    assert src.num_channels == 2
    assert src.n_frames == 3
    t, chans = src.frame(1)
    np.testing.assert_array_equal(chans[0], imgs[1][0::2])
    np.testing.assert_array_equal(chans[1], imgs[1][1::2])
    batch = src.read_batch(1, [0, 2])
    np.testing.assert_array_equal(batch[0], imgs[0][1::2])
    np.testing.assert_array_equal(batch[1], imgs[2][1::2])


def test_rectify_linear_is_identity(tmp_path):
    """Rectifying through a linear model is (bilinear-exact) identity."""
    from vicalib_tpu.io import outputs

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (24, 32), dtype=np.uint8)
            for _ in range(2)]
    glob = _write_pgms(tmp_path, imgs)
    rig = tmp_path / "rig.xml"
    outputs.write_cameras_xml(
        str(rig), ["linear"], [np.array([40.0, 40.0, 16.0, 12.0])],
        [(np.array([0.0, 0.0, 0.0, 1.0]), np.zeros(3))],
        [32], [24], calibrate_imu=False)
    src = sources.parse_camera_uri(
        f"rectify:[file={rig}]//file://{glob}")
    _, chans = src.frame(0)
    # interior pixels identical (borders clamp)
    np.testing.assert_allclose(chans[0][1:-1, 1:-1],
                               imgs[0][1:-1, 1:-1], atol=1)


def test_uvc_rejected():
    with pytest.raises(ValueError, match="uvc"):
        sources.parse_camera_uri("uvc://0")


def test_per_channel_stamp_dedup_and_association(tmp_path):
    """Async stereo: per-channel clocks, duplicated stamps de-dup'd, frames
    matched by nearest time, frames missing in one channel dropped
    (vicalib-task.cc:612-678)."""
    rng = np.random.default_rng(0)
    imgs0 = [rng.integers(0, 255, (8, 8), dtype=np.uint8) for _ in range(6)]
    # channel 1: frame 3 dropped, frame 1 delivered twice (same stamp)
    imgs1 = [rng.integers(0, 255, (8, 8), dtype=np.uint8) for _ in range(6)]
    g0 = _write_pgms(tmp_path, imgs0, sub="cam0")
    g1 = _write_pgms(tmp_path, imgs1, sub="cam1")
    t0 = np.arange(6) * 0.1
    # ch1 stamps: 0.0, 0.1, 0.1(dup), 0.203, 0.401, 0.502 — no ~0.3 frame
    t1 = np.array([0.001, 0.1, 0.1, 0.203, 0.401, 0.502])
    np.savetxt(str(tmp_path / "cam0" / "timestamps.txt"), t0)
    np.savetxt(str(tmp_path / "cam1" / "timestamps.txt"), t1)

    src = sources.parse_camera_uri(f"file://[{g0},{g1}]")
    # duplicate stamp dropped from channel 1
    assert len(src.files[1]) == 5
    np.testing.assert_allclose(src.channel_stamps(1),
                               [0.001, 0.1, 0.203, 0.401, 0.502])

    times, sel = sources.associate_channels(src)
    # t=0.3 has no channel-1 partner within tol -> dropped
    np.testing.assert_allclose(times, [0.0, 0.1, 0.2, 0.4, 0.5])
    np.testing.assert_array_equal(sel[0], [0, 1, 2, 4, 5])
    np.testing.assert_array_equal(sel[1], [0, 1, 2, 3, 4])
    # the de-dup'd file list serves read_batch with associated indices
    batch = src.read_batch(1, list(sel[1]))
    np.testing.assert_array_equal(batch[2], imgs1[3])  # 0.203 ~ frame 3


def test_aligned_channels_identity_mapping(tmp_path):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (8, 8), dtype=np.uint8) for _ in range(4)]
    g0 = _write_pgms(tmp_path, imgs, sub="a")
    g1 = _write_pgms(tmp_path, imgs, sub="b")
    t = np.arange(4) * 0.05
    np.savetxt(str(tmp_path / "a" / "timestamps.txt"), t)
    np.savetxt(str(tmp_path / "b" / "timestamps.txt"), t)
    src = sources.parse_camera_uri(f"file://[{g0},{g1}]")
    times, sel = sources.associate_channels(src)
    np.testing.assert_allclose(times, t)
    np.testing.assert_array_equal(sel[0], sel[1])
