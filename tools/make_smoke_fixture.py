"""Generate the checked-in real-data smoke fixture (tests/data/vi_smoke).

Reference on-disk layout (/root/reference/README.md:34-48): a directory of
PGM frames + a CSV IMU directory (accel.txt / gyro.txt / timestamp.txt).
The fixture deliberately exercises format variety the simulated-per-run
engine tests do not:

- both P5 (binary) and P2 (ascii) PGM frames in one sequence
- device-clock timestamps with an arbitrary epoch (t + 1000 s) plus a
  system_times.txt on the true clock
- two-column IMU timestamp.txt (device_time, system_time)

Run once (python tools/make_smoke_fixture.py); the output is committed so
the file-format surface is guarded independent of the simulator.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vicalib_tpu.io import sim, sources  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data", "vi_smoke")
EPOCH = 1000.0          # device clocks start at an arbitrary epoch


def main():
    img_dir = os.path.join(ROOT, "images")
    imu_dir = os.path.join(ROOT, "imu")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(imu_dir, exist_ok=True)

    cfg = sim.default_mono_config(
        n_frames=12, model="linear", imu=True, imu_rate=100.0,
        distance=0.42, orbit_radius=0.25,
        gyro_bias=np.array([0.01, -0.02, 0.015]),
        accel_bias=np.array([0.05, 0.02, -0.04]), seed=5)
    cfg.cameras[0].params[:4] = [240.0, 240.0, 200.0, 150.0]
    cfg.cameras[0].width, cfg.cameras[0].height = 400, 300
    data = sim.simulate(cfg)
    imgs = sim.render_frames(data, cam=0)

    for k, img in enumerate(imgs):
        path = os.path.join(img_dir, f"frame_{k:05d}.pgm")
        if k == 3:
            # one ascii P2 frame: guards the P2 parser path
            with open(path, "w") as f:
                f.write(f"P2\n{img.shape[1]} {img.shape[0]}\n255\n")
                for row in img:
                    f.write(" ".join(str(int(v)) for v in row) + "\n")
        else:
            sources.write_pgm(path, img)
    np.savetxt(os.path.join(img_dir, "timestamps.txt"),
               data.frame_times + EPOCH, fmt="%.9f")
    np.savetxt(os.path.join(img_dir, "system_times.txt"),
               data.frame_times, fmt="%.9f")
    np.savetxt(os.path.join(imu_dir, "accel.txt"), data.accel, fmt="%.9f")
    np.savetxt(os.path.join(imu_dir, "gyro.txt"), data.gyro, fmt="%.9f")
    np.savetxt(os.path.join(imu_dir, "timestamp.txt"),
               np.stack([data.imu_times + EPOCH, data.imu_times], axis=1),
               fmt="%.9f")

    gt = {
        "model": "linear",
        "intrinsics": [float(v) for v in cfg.cameras[0].params[:4]],
        "q_ck": [float(v) for v in np.asarray(cfg.cameras[0].T_ck[0])],
        "t_ck": [float(v) for v in np.asarray(cfg.cameras[0].T_ck[1])],
        "gyro_bias": [float(v) for v in cfg.gyro_bias],
        "accel_bias": [float(v) for v in cfg.accel_bias],
        "time_offset": float(cfg.time_offset),
        "epoch": EPOCH,
        "n_frames": int(cfg.n_frames),
    }
    with open(os.path.join(ROOT, "gt.json"), "w") as f:
        json.dump(gt, f, indent=1)
    total = sum(os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(ROOT) for fn in fns)
    print(f"wrote {ROOT} ({total / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
