"""Standalone target tracker — the reference's second executable.

Reference analog: src/tracker.cc:36-130 (``tracker`` binary): per frame,
detect the grid, estimate the target-from-camera pose and print T_gw; the
GUI trail is replaced by optional SVG/poses output (headless parity).

Usage:
  python -m vicalib_tpu.tracker -cam 'file://<dir>/*.pgm' [-models linear]
      [-grid_preset medium] [-output_poses poses_tracker.txt]
"""
from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger("vicalib_tpu.tracker")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tracker")
    p.add_argument("--cam", "-cam", required=True)
    p.add_argument("--models", "-models", default="linear")
    p.add_argument("--model_files", "-model_files", default="")
    p.add_argument("--grid_preset", "-grid_preset", default="")
    p.add_argument("--grid_height", "-grid_height", type=int, default=10)
    p.add_argument("--grid_width", "-grid_width", type=int, default=19)
    p.add_argument("--grid_spacing", "-grid_spacing", type=float,
                   default=0.01355)
    p.add_argument("--grid_seed", "-grid_seed", type=int, default=71)
    p.add_argument("--output_poses", "-output_poses", default="")
    ns = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname).1s %(name)s: %(message)s")

    import jax.numpy as jnp

    from .cameras import get_model
    from .detect import pnp
    from .detect.conics import ConicParams, find_conics
    from .geometry import quat_np
    from .io import outputs as out_io
    from .io import sources
    from .targets import grid as grid_mod
    from .targets.grid_match import match_target

    camera = sources.parse_camera_uri(ns.cam)
    if ns.grid_preset:
        target = grid_mod.load_preset(ns.grid_preset)
    else:
        target = grid_mod.TargetGrid(
            grid_mod.make_pattern(ns.grid_height, ns.grid_width,
                                  ns.grid_seed), ns.grid_spacing)

    if ns.model_files:
        cam_info = out_io.read_cameras_xml(ns.model_files.split(",")[0])[0]
        model = get_model(cam_info["model"])
        params = jnp.asarray(cam_info["params"])
    else:
        model = get_model(ns.models.split(",")[0])
        t0, im0 = camera.frame(0)
        h, w = im0[0].shape
        params = model.init_params(w, h, dtype=jnp.float32)

    p3d = target.circles_3d()
    rows = []
    n_tracked = 0
    for k in range(camera.n_frames):
        t, imgs = camera.frame(k)
        det = find_conics(jnp.asarray(imgs[0], jnp.float32),
                          ConicParams(max_conics=512))
        m = match_target(np.asarray(det["center"]), np.asarray(det["radius"]),
                         np.asarray(det["valid"]), target)
        if not m.ok:
            log.info("frame %d: tracking lost", k)
            continue
        sel = m.grid_coords[:, 0] >= 0
        gidx = (m.grid_coords[sel, 1] * target.cols + m.grid_coords[sel, 0])
        rays = model.unproject(jnp.asarray(np.asarray(det["center"])[sel]),
                               params)[:, :2]
        full_rays = np.zeros((target.n_points, 2))
        valid = np.zeros(target.n_points)
        full_rays[gidx] = np.asarray(rays)
        valid[gidx] = 1.0
        q_cw, t_cw = pnp.pnp_planar(jnp.asarray(full_rays),
                                    jnp.asarray(p3d[:, :2]),
                                    jnp.asarray(valid))
        n_tracked += 1
        # T_gw == T_cw here (grid frame is the world frame)
        T = np.eye(4)
        T[:3, :3] = quat_np.to_matrix(np.asarray(q_cw))
        T[:3, 3] = np.asarray(t_cw)
        print(f"frame {k} t={t:.6f} tracked {int(sel.sum())} dots; T_gw =")
        np.savetxt(sys.stdout, T, fmt="%+.6f")
        rows.append(out_io.t2cart(T))
    if ns.output_poses and rows:
        np.savetxt(ns.output_poses, np.stack(rows), delimiter="\t", fmt="%f")
        log.info("wrote %s (%d poses)", ns.output_poses, len(rows))
    log.info("tracked %d/%d frames", n_tracked, camera.n_frames)
    return 0 if n_tracked else 1


if __name__ == "__main__":
    sys.exit(main())
