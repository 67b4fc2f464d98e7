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
