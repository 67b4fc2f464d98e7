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


class _FakeMmap:
    """Stands in for an mmap'd V4L2 buffer: writable bytes + close()."""

    def __init__(self, length):
        self.data = bytearray(length)
        self.closed = False

    def __getitem__(self, sl):
        return bytes(self.data[sl])

    def close(self):
        self.closed = True


class _FakeV4l2:
    """Simulated V4L2 kernel: a YUYV-only camera driving the full
    negotiate -> mmap ring -> QBUF/DQBUF state machine in io/uvc.py."""

    def __init__(self, width=32, height=24, n_frames=64):
        from vicalib_tpu.io import uvc
        self.uvc = uvc
        self.width, self.height = width, height
        self.frame_bytes = width * height * 2
        self.opened = self.streaming = False
        self.maps = {}
        self.queued = []
        self.seq = 0
        self.frames = []
        rng = np.random.default_rng(7)
        for _ in range(n_frames):
            y = rng.integers(0, 255, (height, width), dtype=np.uint8)
            yuyv = np.empty((height, width * 2), np.uint8)
            yuyv[:, 0::2] = y
            yuyv[:, 1::2] = 128
            self.frames.append((y, yuyv.tobytes()))

    def open(self, path):
        assert path == "/dev/video1"
        self.opened = True
        return 42

    def close(self, fd):
        self.opened = False

    def mmap(self, fd, length, offset):
        m = _FakeMmap(length)
        self.maps[offset] = m
        return m

    def wait_readable(self, fd, timeout_s):
        return True

    def ioctl(self, fd, request, arg):
        u = self.uvc
        assert self.opened
        if request == u.VIDIOC_QUERYCAP:
            arg.device_caps = u.CAP_VIDEO_CAPTURE | u.CAP_STREAMING
        elif request == u.VIDIOC_S_FMT:
            # GREY unsupported: the driver adjusts to YUYV at its native
            # size regardless of what was asked (standard V4L2 behavior)
            arg.pix.pixelformat = u.PIX_FMT_YUYV
            arg.pix.width, arg.pix.height = self.width, self.height
            arg.pix.sizeimage = self.frame_bytes
        elif request == u.VIDIOC_S_PARM:
            assert arg.tpf_den == 15
        elif request == u.VIDIOC_REQBUFS:
            arg.count = min(arg.count, 2)  # grant fewer than asked
        elif request == u.VIDIOC_QUERYBUF:
            arg.length = self.frame_bytes
            arg.m.offset = 4096 * (arg.index + 1)
        elif request == u.VIDIOC_QBUF:
            self.queued.append((arg.index, arg.m.offset
                                or 4096 * (arg.index + 1)))
        elif request == u.VIDIOC_STREAMON:
            self.streaming = True
        elif request == u.VIDIOC_STREAMOFF:
            self.streaming = False
        elif request == u.VIDIOC_DQBUF:
            assert self.streaming and self.queued
            idx, off = self.queued.pop(0)
            _, raw = self.frames[self.seq % len(self.frames)]
            self.maps[off].data[:len(raw)] = raw
            arg.index = idx
            arg.bytesused = len(raw)
            arg.timestamp.tv_sec = 100 + self.seq // 15
            arg.timestamp.tv_usec = int((self.seq % 15) / 15.0 * 1e6)
            self.seq += 1
        else:
            raise AssertionError(f"unexpected ioctl {request:#x}")
        return 0


def test_uvc_capture_state_machine():
    """uvc:// drives the V4L2 ring correctly and yields grayscale frames
    with monotonic kernel timestamps (simulated YUYV device)."""
    fake = _FakeV4l2()
    src = sources.parse_camera_uri("uvc:[dev=/dev/video1,num=5,fps=15]//")
    assert src.num == 5 and src.fps == 15.0
    src.kernel = fake
    assert src.n_frames == 5
    assert src.num_channels == 1
    # luma extracted from YUYV, in capture order
    for k in range(5):
        t, (img,) = src.frame(k)
        np.testing.assert_array_equal(img, fake.frames[k][0])
    batch = src.read_batch(0, [0, 3])
    np.testing.assert_array_equal(batch[1], fake.frames[3][0])
    stamps = src.channel_stamps(0)
    assert stamps.shape == (5,) and np.all(np.diff(stamps) > 0)
    np.testing.assert_allclose(stamps[1] - stamps[0], 1 / 15.0, atol=1e-6)
    # system clock present and distinct from the device clock
    assert src.has_system_times
    assert src.timestamp(0, system=True) != src.timestamp(0)
    # device released, ring unmapped, stream stopped
    assert not fake.opened and not fake.streaming
    assert all(m.closed for m in fake.maps.values())


def test_uvc_device_index_and_missing_device():
    from vicalib_tpu.io.uvc import UvcSource
    src = sources.parse_camera_uri("uvc://3")
    assert isinstance(src, UvcSource) and src.device == "/dev/video3"
    with pytest.raises((OSError, ValueError)):
        UvcSource(device="/dev/nonexistent-video", num=1).n_frames


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
