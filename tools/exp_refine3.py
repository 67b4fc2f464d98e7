"""Isolate: discrete-sampling aliasing vs continuous-geometry bias.

Re-render single dots in numpy with the exact renderer math at 1x and 8x
subpixel sampling; compare intensity centroids to the GT projected center.
"""
import numpy as np

z = np.load("/tmp/refine_exp.npz")
gt_pix, gt_vis = z["pixels"], z["visible"]
q_wk, t_wk = z["q_wk"], z["t_wk"]
p3d = z["points_3d"]
intr = z["intr"]            # [fu, fv, u0, v0]
fu, fv, u0, v0 = intr[:4]

# radii: large/small per grid value — reconstruct from target defaults
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vicalib_tpu.io import sim as sim_mod
from vicalib_tpu.targets.grid import make_target
target = make_target()
radii = target.radii()


def quat_to_R(q):
    x, y, z_, w = q
    return np.array([
        [1-2*(y*y+z_*z_), 2*(x*y-w*z_), 2*(x*z_+w*y)],
        [2*(x*y+w*z_), 1-2*(x*x+z_*z_), 2*(y*z_-w*x)],
        [2*(x*z_-w*y), 2*(y*z_+w*x), 1-2*(x*x+y*y)]])


def render_patch(k, gi, R=6, ss=1):
    """Render the window around dot gi in frame k at subsample factor ss.

    Returns (coords (N,2) pixel positions, intensities (N,)).
    """
    Rw = quat_to_R(q_wk[k])
    o = t_wk[k]
    gx, gy = gt_pix[k, gi]
    n = (2 * R + 1) * ss
    # subpixel sample positions centered on integer grid convention:
    # at ss=1 samples sit at integers; at ss>1, ss samples per pixel centered
    offs = (np.arange(ss) - (ss - 1) / 2.0) / ss
    base_x = np.arange(int(round(gx)) - R, int(round(gx)) + R + 1)
    base_y = np.arange(int(round(gy)) - R, int(round(gy)) + R + 1)
    xs = (base_x[:, None] + offs[None, :]).reshape(-1)
    ys = (base_y[:, None] + offs[None, :]).reshape(-1)
    XX, YY = np.meshgrid(xs, ys)
    u = XX.reshape(-1); v = YY.reshape(-1)
    ray = np.stack([(u - u0) / fu, (v - v0) / fv, np.ones_like(u)], axis=1)
    d = ray @ Rw.T
    tpl = -o[2] / d[:, 2]
    pt = o[None, :2] + tpl[:, None] * d[:, :2]
    foot = np.abs(tpl) * np.sqrt(2.0) / fu
    edge = np.maximum(foot, 1e-6)
    # distance to ALL dots (max coverage, like the renderer)
    dist = np.linalg.norm(pt[:, None, :] - p3d[None, :, :2], axis=2)
    covall = 1.0 / (1.0 + np.exp(-(radii[None, :] - dist) / (edge[:, None] * 0.5)))
    cov = covall.max(axis=1)
    cov = np.where(tpl > 0, cov, 0.0)
    img = 255.0 * (1.0 - 0.87 * cov)
    return np.stack([u, v], axis=1), img


def centroid(coords, img):
    w = 255.0 - img
    s = w.sum()
    return (w[:, None] * coords).sum(axis=0) / s


errs1, errs8, errsq = [], [], []
rng = np.random.default_rng(0)
ks = rng.choice(len(q_wk), size=8, replace=False)
for k in ks:
    vis = np.where(gt_vis[k])[0]
    for gi in vis[::5]:
        gx, gy = gt_pix[k, gi]
        others = gt_pix[k][gt_vis[k]]
        d = np.linalg.norm(others - [gx, gy], axis=1)
        if len(d) > 1 and np.sort(d)[1] < 12:
            continue
        if not (10 < gx < 790 and 10 < gy < 590):
            continue
        c1 = centroid(*render_patch(k, gi, R=5, ss=1))
        c8 = centroid(*render_patch(k, gi, R=5, ss=8))
        errs1.append(np.hypot(*(c1 - [gx, gy])))
        errs8.append(np.hypot(*(c8 - [gx, gy])))

errs1, errs8 = map(np.asarray, (errs1, errs8))
print(f"1x sampling:   n={len(errs1)} median={np.median(errs1):.4f} "
      f"p90={np.percentile(errs1, 90):.4f}")
print(f"8x supersample: median={np.median(errs8):.4f} "
      f"p90={np.percentile(errs8, 90):.4f}")

# quantization test: floor (renderer's astype) vs round
for name, q in (("floor", np.floor), ("round", np.round)):
    errs = []
    for k in ks:
        vis = np.where(gt_vis[k])[0]
        for gi in vis[::5]:
            gx, gy = gt_pix[k, gi]
            others = gt_pix[k][gt_vis[k]]
            d = np.linalg.norm(others - [gx, gy], axis=1)
            if len(d) > 1 and np.sort(d)[1] < 12:
                continue
            if not (10 < gx < 790 and 10 < gy < 590):
                continue
            coords, img = render_patch(k, gi, R=5, ss=1)
            img = q(img)
            errs.append(np.hypot(*(centroid(coords, img) - [gx, gy])))
    errs = np.asarray(errs)
    print(f"1x {name}-quantized: median={np.median(errs):.4f} "
          f"p90={np.percentile(errs, 90):.4f}")

# compare actual frames vs re-render on the SAME dot set
frames = z["frames"].astype(np.float64)
errs_a, diffs = [], []
for k in ks:
    vis = np.where(gt_vis[k])[0]
    img_full = frames[k]
    for gi in vis[::5]:
        gx, gy = gt_pix[k, gi]
        others = gt_pix[k][gt_vis[k]]
        d = np.linalg.norm(others - [gx, gy], axis=1)
        if len(d) > 1 and np.sort(d)[1] < 12:
            continue
        if not (10 < gx < 790 and 10 < gy < 590):
            continue
        R = 5; win = 2 * R + 1
        x0, y0 = int(round(gx)) - R, int(round(gy)) - R
        patch = img_full[y0:y0 + win, x0:x0 + win]
        yy2, xx2 = np.mgrid[0:win, 0:win].astype(np.float64)
        coords = np.stack([(xx2 + x0).ravel(), (yy2 + y0).ravel()], axis=1)
        errs_a.append(np.hypot(*(centroid(coords, patch.ravel()) - [gx, gy])))
        _, img_r = render_patch(k, gi, R=5, ss=1)
        diffs.append(np.abs(np.floor(img_r) - patch.ravel()).max())
errs_a = np.asarray(errs_a)
print(f"actual frames, same set: median={np.median(errs_a):.4f} "
      f"p90={np.percentile(errs_a, 90):.4f}")
print(f"max |rerender - actual| per patch: median={np.median(diffs):.1f} "
      f"max={np.max(diffs):.1f}")
