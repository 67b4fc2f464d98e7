"""Experiment: quantify conic-center error and prototype sub-pixel refinement.

Stage 1 (TPU): render frames at the detect-bench geometry, run the current
detection, save frames + detections + ground truth to /tmp/refine_exp.npz.
Stage 2 (offline numpy): measure the error and try refinement variants.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/refine_exp.npz"


def stage1(F=32):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    import jax.numpy as jnp
    from vicalib_tpu.detect.conics import ConicParams, find_conics_batch
    from vicalib_tpu.io import sim

    cfg = sim.default_mono_config(n_frames=F, model="linear",
                                  distance=0.35, orbit_radius=0.12)
    t0 = time.time()
    data = sim.simulate(cfg)
    frames = sim.render_frames(data, cam=0)
    print(f"rendered {frames.shape} in {time.time()-t0:.1f}s")
    params = ConicParams(max_conics=512)
    t0 = time.time()
    det = find_conics_batch(jnp.asarray(frames), params, backend="auto")
    det = {k: np.asarray(v) for k, v in det.items()}
    print(f"detect {time.time()-t0:.1f}s")
    np.savez(CACHE, frames=frames, pixels=data.pixels[0],
             visible=data.visible[0],
             q_wk=data.T_wk[0], t_wk=data.T_wk[1],
             points_3d=data.points_3d,
             intr=cfg.cameras[0].params,
             det_center=det["center"], det_radius=det["radius"],
             det_valid=det["valid"], det_area=det["area"])
    print("saved", CACHE)


def match_stats(centers, valid, gt_pix, gt_vis, tol=2.0):
    """Nearest-neighbor match detections to GT projections; return errors."""
    errs = []
    pairs = []
    for k in range(len(centers)):
        c = centers[k][valid[k]]
        g = gt_pix[k][gt_vis[k]]
        if len(c) == 0 or len(g) == 0:
            continue
        d = np.linalg.norm(g[:, None, :] - c[None, :, :], axis=2)
        j = d.argmin(axis=1)
        m = d[np.arange(len(g)), j] < tol
        errs.append(d[np.arange(len(g)), j][m])
        pairs.append((k, np.where(gt_vis[k])[0][m],
                      np.where(valid[k])[0][j[m]]))
    return np.concatenate(errs), pairs


def stage2():
    z = np.load(CACHE)
    frames = z["frames"].astype(np.float64)
    gt_pix, gt_vis = z["pixels"], z["visible"]
    det_c, det_v = z["det_center"], z["det_valid"]

    errs, pairs = match_stats(det_c, det_v, gt_pix, gt_vis)
    print(f"moments path: n={len(errs)} median={np.median(errs):.4f} "
          f"mean={errs.mean():.4f} p90={np.percentile(errs, 90):.4f}")

    # bias vector analysis: is the error systematic (bias) or noise?
    dx, dy = [], []
    for k, gi, ci in pairs:
        d = det_c[k][ci] - gt_pix[k][gi]
        dx.append(d[:, 0]); dy.append(d[:, 1])
    dx, dy = np.concatenate(dx), np.concatenate(dy)
    print(f"bias: mean dx={dx.mean():.4f} dy={dy.mean():.4f} "
          f"std dx={dx.std():.4f} dy={dy.std():.4f}")

    # ---- refinement A: windowed background-relative weighted centroid
    for R, iters, p in [(3, 3, 1.0), (4, 3, 1.0), (4, 3, 1.5), (5, 3, 1.0),
                        (4, 5, 1.0), (4, 3, 2.0)]:
        ref = refine_centroid(frames, det_c, det_v, R=R, iters=iters, pw=p)
        errs2, _ = match_stats(ref, det_v, gt_pix, gt_vis)
        print(f"refine R={R} iters={iters} pow={p}: "
              f"median={np.median(errs2):.4f} mean={errs2.mean():.4f} "
              f"p90={np.percentile(errs2, 90):.4f}")


def refine_centroid(frames, centers, valid, R=4, iters=3, pw=1.0):
    """Iterative windowed darkness centroid on the raw image.

    For each detection, take a (2R+1)^2 window around the current center,
    estimate background as the window max, weight = (bg - I)^pw, recenter.
    """
    F, H, W = frames.shape
    out = centers.copy()
    win = 2 * R + 1
    yy, xx = np.mgrid[0:win, 0:win].astype(np.float64)
    for k in range(F):
        img = frames[k]
        for ci in np.where(valid[k])[0]:
            cx, cy = out[k, ci]
            for _ in range(iters):
                x0 = int(round(cx)) - R
                y0 = int(round(cy)) - R
                if x0 < 0 or y0 < 0 or x0 + win > W or y0 + win > H:
                    break
                patch = img[y0:y0 + win, x0:x0 + win]
                bg = patch.max()
                w = np.maximum(bg - patch, 0.0) ** pw
                s = w.sum()
                if s <= 0:
                    break
                ncx = (w * xx).sum() / s + x0
                ncy = (w * yy).sum() / s + y0
                if abs(ncx - cx) < 1e-4 and abs(ncy - cy) < 1e-4:
                    cx, cy = ncx, ncy
                    break
                cx, cy = ncx, ncy
            out[k, ci] = cx, cy
    return out


if __name__ == "__main__":
    if "--stage1" in sys.argv or not os.path.exists(CACHE):
        stage1()
    stage2()


def refine_adaptive(frames, centers, radii_det, valid, Rs=(4, 6), iters=3,
                    pw=2.0, rthresh=3.0):
    F, H, W = frames.shape
    out = centers.copy()
    for k in range(F):
        img = frames[k]
        for ci in np.where(valid[k])[0]:
            R = Rs[0] if radii_det[k, ci] < rthresh else Rs[1]
            win = 2 * R + 1
            yy, xx = np.mgrid[0:win, 0:win].astype(np.float64)
            cx, cy = out[k, ci]
            for _ in range(iters):
                x0 = int(round(cx)) - R
                y0 = int(round(cy)) - R
                if x0 < 0 or y0 < 0 or x0 + win > W or y0 + win > H:
                    break
                patch = img[y0:y0 + win, x0:x0 + win]
                bg = patch.max()
                w = np.maximum(bg - patch, 0.0) ** pw
                s = w.sum()
                if s <= 0:
                    break
                cx = (w * xx).sum() / s + x0
                cy = (w * yy).sum() / s + y0
            out[k, ci] = cx, cy
    return out


def stage3():
    z = np.load(CACHE)
    frames = z["frames"].astype(np.float64)
    gt_pix, gt_vis = z["pixels"], z["visible"]
    det_c, det_v, det_r = z["det_center"], z["det_valid"], z["det_radius"]
    for Rs, pw, rt in [((4, 6), 2.0, 3.0), ((4, 5), 2.0, 3.0),
                       ((4, 6), 1.5, 3.0), ((3, 5), 2.0, 3.0),
                       ((4, 6), 2.0, 3.5)]:
        ref = refine_adaptive(frames, det_c, det_r, det_v, Rs=Rs, pw=pw,
                              rthresh=rt)
        errs2, _ = match_stats(ref, det_v, gt_pix, gt_vis)
        print(f"adaptive Rs={Rs} pow={pw} rt={rt}: "
              f"median={np.median(errs2):.4f} mean={errs2.mean():.4f} "
              f"p90={np.percentile(errs2, 90):.4f} "
              f"p99={np.percentile(errs2, 99):.4f}")
