"""Data sources: image-file and CSV-IMU replay — the HAL-driver equivalent.

The reference consumes sensors through HAL URIs (reference: README.md:34-48,
src/vicalib-engine.cc:124-144): ``file://<dir>/images/*.pgm`` for cameras and
``csv://<dir>/imu`` for IMU streams (accel.txt / gyro.txt / timestamp.txt).
This module replays the same on-disk layouts.  Multi-channel rigs use one
glob per channel, ``[glob0,glob1]`` style, like HAL's split-image URIs.

PGM (P2/P5) parsing is native here; PNG/JPG decode via the optional C++
native loader (native/) or PIL if present.
"""
from __future__ import annotations

import dataclasses
import glob as globlib
import os
import re

import numpy as np


def read_pgm(path: str) -> np.ndarray:
    """Read a P5 (binary) or P2 (ascii) PGM file -> (H, W) uint8/uint16."""
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, whitespace/comments, width, height, maxval
    tokens = []
    i = 0
    while len(tokens) < 4:
        m = re.match(rb"\s*(#[^\n]*\n|\S+)", data[i:])
        if m is None:
            raise ValueError(f"bad PGM header in {path}")
        tok = m.group(1)
        i += m.end()
        if not tok.startswith(b"#"):
            tokens.append(tok)
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), \
        int(tokens[3])
    if magic == b"P5":
        dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
        img = np.frombuffer(data[i + 1:], dtype=dtype,
                            count=w * h).reshape(h, w)
        return img.astype(np.uint8) if maxval < 256 else img
    if magic == b"P2":
        vals = np.array(data[i:].split(), dtype=int)
        return vals[:w * h].reshape(h, w).astype(np.uint8)
    raise ValueError(f"unsupported PGM magic {magic!r} in {path}")


def write_pgm(path: str, img: np.ndarray):
    img = np.asarray(img, dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def read_image(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pgm":
        from . import native
        img = native.read_pgm(path)
        return img if img is not None else read_pgm(path)
    try:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("L"))
        return img
    except ImportError as e:
        raise ValueError(
            f"cannot decode {ext} without PIL; use .pgm") from e


@dataclasses.dataclass
class CameraSource:
    """Replays image files as a (multi-channel) camera.

    Reference analog: hal::Camera with the file:// driver
    (vicalib-engine.cc:126, 514-527).  Timestamps come from a
    ``timestamps.txt`` next to the images if present, else the frame index
    over ``frame_rate``.
    """
    channel_globs: list
    frame_rate: float = 10.0

    def __post_init__(self):
        self.files = [sorted(globlib.glob(g)) for g in self.channel_globs]
        # Per-channel clocks: each channel's directory may carry its own
        # timestamps.txt / system_times.txt (async multi-camera rigs where
        # channels deliver at different times).  Repeated consecutive
        # stamps within a channel are de-dup'd — the reference drops
        # images whose timestamp did not advance
        # (vicalib-task.cc:612-678, esp. 633-653).
        self._ch_device = []
        self._ch_system = []
        for c, flist in enumerate(self.files):
            nch = len(flist)
            dev = sys_t = None
            if flist:
                tdir = os.path.dirname(flist[0])
                tfile = os.path.join(tdir, "timestamps.txt")
                if os.path.exists(tfile):
                    dev = np.loadtxt(tfile).reshape(-1)[:nch]
                sfile = os.path.join(tdir, "system_times.txt")
                if os.path.exists(sfile):
                    sys_t = np.loadtxt(sfile).reshape(-1)[:nch]
            if dev is not None:
                if len(dev) < nch:
                    flist = flist[:len(dev)]
                    nch = len(flist)
                # de-dup repeated stamps (keep the first occurrence)
                keep = np.ones(nch, dtype=bool)
                if nch > 1:
                    keep[1:] = np.diff(dev[:nch]) > 0
                if not keep.all():
                    flist = [f for f, k in zip(flist, keep) if k]
                    dev = dev[:nch][keep]
                    if sys_t is not None:
                        sys_t = sys_t[:nch][keep]
                dev = np.asarray(dev, dtype=np.float64)
            self.files[c] = flist
            # dev None = index clock (k / frame_rate), synthesized lazily
            # so a post-construction frame_rate override still applies
            self._ch_device.append(dev)
            self._ch_system.append(None if sys_t is None
                                   else np.asarray(sys_t, dtype=np.float64))
        n = min(len(f) for f in self.files) if self.files else 0
        self.n_frames = n
        self._timestamps = (self._ch_device[0][:n]
                            if self.files and self._ch_device[0] is not None
                            else None)
        self._system_times = (self._ch_system[0][:n]
                              if self.files and self._ch_system[0] is not None
                              else None)

    def channel_stamps(self, c: int, system: bool = False) -> np.ndarray:
        """Per-channel frame stamps (post de-dup), device or system clock."""
        if system and self._ch_system[c] is not None:
            return self._ch_system[c]
        if self._ch_device[c] is not None:
            return self._ch_device[c]
        return np.arange(len(self.files[c])) / self.frame_rate

    @property
    def num_channels(self):
        return len(self.files)

    @property
    def has_system_times(self):
        return self._system_times is not None

    def timestamp(self, k: int, system: bool = False) -> float:
        """Frame stamp on the device clock, or the system clock with
        ``system=True`` (falls back to device time when no system_times.txt
        exists — i.e. the clocks are assumed synchronized)."""
        if system and self._system_times is not None:
            return float(self._system_times[k])
        if self._timestamps is not None:
            return float(self._timestamps[k])
        return k / self.frame_rate

    def frame(self, k: int):
        """-> (timestamp, [img per channel])"""
        return self.timestamp(k), [read_image(f[k]) for f in self.files]

    def read_batch(self, channel: int, indices):
        """Decode many frames of one channel at once (native thread pool
        when available — the reference's HAL-driver role)."""
        paths = [self.files[channel][k] for k in indices]
        if not paths:
            return []
        if all(p.lower().endswith(".pgm") for p in paths):
            from . import native
            first = read_image(paths[0])
            h, w = first.shape
            batch = native.read_pgm_batch(paths, w, h)
            if batch is not None:
                return list(batch)
        return [read_image(p) for p in paths]

    def __iter__(self):
        for k in range(self.n_frames):
            yield self.frame(k)


@dataclasses.dataclass
class ImuSource:
    """CSV IMU replay: accel.txt / gyro.txt / timestamp.txt in a directory.

    Reference analog: hal::IMU with the csv:// driver (README.md:48,
    vicalib-engine.cc:136-138).  Each file has one row per sample; accel and
    gyro rows are 3 values (or 4 with a leading timestamp), timestamp.txt
    carries the stamps.  A two-column timestamp.txt models the reference's
    device/system clock pair (ImuMsg::device_time / system_time,
    vicalib-task.cc:689-691): column 0 is the device clock, column 1 the
    system clock; ``use_system_time`` selects which one ``times`` exposes.
    """
    directory: str
    use_system_time: bool = False

    def __post_init__(self):
        d = self.directory
        accel = np.atleast_2d(np.loadtxt(os.path.join(d, "accel.txt"),
                                         delimiter=None))
        gyro = np.atleast_2d(np.loadtxt(os.path.join(d, "gyro.txt")))
        ts_path = os.path.join(d, "timestamp.txt")
        self.device_times = self.system_times = None
        if os.path.exists(ts_path):
            ts = np.loadtxt(ts_path)
            if ts.ndim == 1:
                self.device_times = self.system_times = ts
            else:
                self.device_times = ts[:, 0]
                self.system_times = ts[:, 1]
        else:
            self.device_times = self.system_times = accel[:, 0]
            accel = accel[:, 1:]
            gyro = gyro[:, 1:]
        self.times = (self.system_times if self.use_system_time
                      else self.device_times)
        self.accel = accel[:, -3:]
        self.gyro = gyro[:, -3:]
        n = min(len(self.times), len(self.accel), len(self.gyro))
        self.times, self.accel, self.gyro = (
            self.times[:n], self.accel[:n], self.gyro[:n])


class DeinterlaceSource:
    """``deinterlace://<inner>``: split each interlaced frame's even/odd
    scanlines into a 2-channel rig (HAL deinterlace driver, README.md:34-42).
    """

    def __init__(self, inner):
        self.inner = inner
        self.n_frames = inner.n_frames
        self.frame_rate = getattr(inner, "frame_rate", 10.0)

    @property
    def num_channels(self):
        return 2 * self.inner.num_channels

    def timestamp(self, k):
        return self.inner.timestamp(k)

    def channel_stamps(self, c, system=False):
        get = getattr(self.inner, "channel_stamps", None)
        if get is not None:
            return get(c // 2, system)
        return np.array([self.inner.timestamp(k)
                         for k in range(self.n_frames)])

    @staticmethod
    def _split(img):
        return img[0::2], img[1::2]

    def frame(self, k):
        t, imgs = self.inner.frame(k)
        out = []
        for im in imgs:
            even, odd = self._split(im)
            out.extend([even, odd])
        return t, out

    def read_batch(self, channel, indices):
        inner_c, field = divmod(channel, 2)
        batch = self.inner.read_batch(inner_c, indices)
        return [im[field::2] for im in batch]

    def __iter__(self):
        for k in range(self.n_frames):
            yield self.frame(k)


class RectifySource:
    """``rectify:[file=cameras.xml]//<inner>``: undistort every channel to
    its linear (pinhole-K) model via a precomputed bilinear remap
    (HAL rectify driver, README.md:34-42).

    The remap lookup table is built once per channel from the rig file's
    camera model (unproject through K, project through the distorted model);
    application is a batched gather — vmapped on device.
    """

    def __init__(self, inner, rig_file: str):
        from ..cameras.models import get_model
        from .outputs import read_cameras_xml

        self.inner = inner
        self.n_frames = inner.n_frames
        self.frame_rate = getattr(inner, "frame_rate", 10.0)
        cams = read_cameras_xml(rig_file)
        if len(cams) < inner.num_channels:
            raise ValueError(
                f"rig file {rig_file} has {len(cams)} cameras; "
                f"source has {inner.num_channels} channels")
        self._maps = []
        for c in range(inner.num_channels):
            cam = cams[c]
            model = get_model(cam["model"])
            params = np.asarray(cam["params"], dtype=np.float64)
            h, w = int(cam["height"]), int(cam["width"])
            fu, fv, u0, v0 = params[0], params[1], params[2], params[3]
            # output pixel -> ideal ray through pinhole K -> distorted pixel
            u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                               np.arange(h, dtype=np.float64))
            rays = np.stack([(u - u0) / fu, (v - v0) / fv,
                             np.ones_like(u)], axis=-1)
            import jax.numpy as jnp
            src = np.asarray(model.project(
                jnp.asarray(rays.reshape(-1, 3)),
                jnp.asarray(params))).reshape(h, w, 2)
            self._maps.append(src.astype(np.float32))

    @property
    def num_channels(self):
        return self.inner.num_channels

    def timestamp(self, k):
        return self.inner.timestamp(k)

    def channel_stamps(self, c, system=False):
        get = getattr(self.inner, "channel_stamps", None)
        if get is not None:
            return get(c, system)
        return np.array([self.inner.timestamp(k)
                         for k in range(self.n_frames)])

    @staticmethod
    def _remap(img, src):
        h, w = img.shape[:2]
        x = np.clip(src[..., 0], 0, w - 1.001)
        y = np.clip(src[..., 1], 0, h - 1.001)
        x0 = x.astype(np.int32)
        y0 = y.astype(np.int32)
        fx = x - x0
        fy = y - y0
        im = img.astype(np.float32)
        top = im[y0, x0] * (1 - fx) + im[y0, x0 + 1] * fx
        bot = im[y0 + 1, x0] * (1 - fx) + im[y0 + 1, x0 + 1] * fx
        return (top * (1 - fy) + bot * fy).astype(img.dtype)

    def frame(self, k):
        t, imgs = self.inner.frame(k)
        return t, [self._remap(im, self._maps[c])
                   for c, im in enumerate(imgs)]

    def read_batch(self, channel, indices):
        batch = self.inner.read_batch(channel, indices)
        return [self._remap(im, self._maps[channel]) for im in batch]

    def __iter__(self):
        for k in range(self.n_frames):
            yield self.frame(k)


def associate_channels(camera, system: bool = False, tol: float = None):
    """Nearest-time superframe association for async multi-camera rigs.

    The reference assembles superframes from channels that deliver at
    different times, de-duping repeated stamps per channel and matching
    images by timestamp (vicalib-task.cc:612-678).  Batch equivalent:
    channel 0 is the reference clock; for every channel-0 frame, each other
    channel contributes its nearest-stamp frame if it lies within ``tol``
    (default: 45% of the median channel-0 frame interval); frames any
    channel misses are dropped.

    Returns (times (F,), sel (C, F) int32 per-channel frame indices).
    Index-aligned sources (no per-channel stamps) come back as the
    identity mapping.
    """
    C = camera.num_channels
    get = getattr(camera, "channel_stamps", None)
    if get is None or C == 1:
        n = camera.n_frames
        times = np.array([camera.timestamp(k, system) if _accepts_system(
            camera) else camera.timestamp(k) for k in range(n)])
        return times, np.tile(np.arange(n, dtype=np.int32), (C, 1))
    ref = np.asarray(get(0, system), dtype=np.float64)
    stamps = [np.asarray(get(c, system), dtype=np.float64)
              for c in range(C)]
    if all(len(s) == len(ref) and np.array_equal(s, ref) for s in stamps):
        n = len(ref)
        return ref, np.tile(np.arange(n, dtype=np.int32), (C, 1))
    if tol is None:
        tol = 0.45 * float(np.median(np.diff(ref))) if len(ref) > 1 else 0.05
    sel = np.zeros((C, len(ref)), dtype=np.int32)
    ok = np.ones(len(ref), dtype=bool)
    sel[0] = np.arange(len(ref))
    for c in range(1, C):
        s = stamps[c]
        j = np.clip(np.searchsorted(s, ref), 0, len(s) - 1)
        j_lo = np.maximum(j - 1, 0)
        pick = np.where(np.abs(s[j_lo] - ref) <= np.abs(s[j] - ref),
                        j_lo, j)
        sel[c] = pick
        ok &= np.abs(s[pick] - ref) <= tol
    return ref[ok], sel[:, ok]


def _accepts_system(camera):
    import inspect
    try:
        return "system" in inspect.signature(camera.timestamp).parameters
    except (TypeError, ValueError):
        return False


def parse_camera_uri(uri: str) -> CameraSource:
    """HAL-style camera URIs (README.md:34-42): ``file://<glob>`` /
    ``file://[g0,g1]`` / bare glob, optionally wrapped by
    ``deinterlace://...`` and ``rectify:[file=cameras.xml]//...``.
    ``uvc:[dev=/dev/video0,num=100,w=640,h=480,fps=30]//`` captures live
    from a V4L2 USB camera (io/uvc.py) then replays the captured frames
    through the same pipeline."""
    m = re.match(r"^(\w+):(\[[^\]]*\])?//(.*)$", uri)
    scheme = m.group(1).lower() if m else "file"
    opts = {}
    if m and m.group(2):
        for kv in m.group(2).strip("[]").split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                opts[k.strip()] = v.strip()
    if scheme == "uvc":
        from .uvc import UvcSource
        path = m.group(3) if m else ""
        return UvcSource(device=opts.get("dev", path or "/dev/video0"),
                         num=int(opts.get("num", 100)),
                         width=int(opts.get("w", 0)),
                         height=int(opts.get("h", 0)),
                         fps=float(opts.get("fps", 30.0)))
    if scheme == "deinterlace":
        return DeinterlaceSource(parse_camera_uri(m.group(3)))
    if scheme == "rectify":
        rig = opts.get("file", "cameras.xml")
        return RectifySource(parse_camera_uri(m.group(3)), rig)
    path = m.group(3) if m else uri
    if path.startswith("["):
        globs = [g.strip() for g in path.strip("[]").split(",")]
    else:
        globs = [path]
    return CameraSource(globs)


def parse_imu_uri(uri: str, use_system_time: bool = False) -> ImuSource:
    path = uri[len("csv://"):] if uri.startswith("csv://") else uri
    return ImuSource(path, use_system_time=use_system_time)
