"""Diagnose: is the error in the estimator, or in the image vs GT relation?

Oracle centroid: window centered at GT, true background (255), generous R.
"""
import numpy as np

z = np.load("/tmp/refine_exp.npz")
frames = z["frames"].astype(np.float64)
gt_pix, gt_vis = z["pixels"], z["visible"]
F, H, W = frames.shape

for R in (4, 5, 6, 8):
    win = 2 * R + 1
    yy, xx = np.mgrid[0:win, 0:win].astype(np.float64)
    errs = []
    for k in range(F):
        img = frames[k]
        for gi in np.where(gt_vis[k])[0]:
            gx, gy = gt_pix[k, gi]
            # skip dots with a neighbor within 2R+2 px (window contamination)
            others = gt_pix[k][gt_vis[k]]
            d = np.linalg.norm(others - [gx, gy], axis=1)
            if np.sort(d)[1] < 2 * R + 2 if len(d) > 1 else False:
                continue
            x0, y0 = int(round(gx)) - R, int(round(gy)) - R
            if x0 < 0 or y0 < 0 or x0 + win > W or y0 + win > H:
                continue
            patch = img[y0:y0 + win, x0:x0 + win]
            w = 255.0 - patch
            s = w.sum()
            cx = (w * xx).sum() / s + x0
            cy = (w * yy).sum() / s + y0
            errs.append(np.hypot(cx - gx, cy - gy))
    errs = np.asarray(errs)
    print(f"oracle R={R}: n={len(errs)} median={np.median(errs):.4f} "
          f"mean={errs.mean():.4f} p90={np.percentile(errs, 90):.4f}")
