"""Adaptive thresholding — the Calibu ImageProcessing equivalent.

Reference behavior (call sites, vicalib-task.cc:114-118, 264-267): grayscale
frame -> local-mean adaptive threshold with ``at_threshold = 0.9`` and window
``width / at_window_ratio`` (ratio 30), ``black_on_white`` dots.  Implemented
with an integral image (2-D cumsum) so the box mean is O(1) per pixel — one
fused XLA graph, batchable over frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_mean(img, radius):
    """Local box mean with clamped borders via integral image.  img: (H, W)."""
    H, W = img.shape
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(img.astype(jnp.float32), 0), 1),
                 ((1, 0), (1, 0)))
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    y0 = jnp.clip(ys - radius, 0, H)
    y1 = jnp.clip(ys + radius + 1, 0, H)
    x0 = jnp.clip(xs - radius, 0, W)
    x1 = jnp.clip(xs + radius + 1, 0, W)
    a = ii[y1[:, None], x1[None, :]]
    b = ii[y0[:, None], x1[None, :]]
    c = ii[y1[:, None], x0[None, :]]
    d = ii[y0[:, None], x0[None, :]]
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(jnp.float32)
    return (a - b - c + d) / area


def adaptive_threshold(img, at_threshold=0.9, at_window_ratio=30.0,
                       black_on_white=True, radius=None):
    """Binary foreground mask of dark dots on light background.

    Foreground iff pixel < local_mean * at_threshold (black_on_white), the
    Calibu parameterization (vicalib-task.cc:116-118).
    Returns (H, W) bool.
    """
    H, W = img.shape
    if radius is None:
        radius = max(int(W / at_window_ratio / 2), 1)
    mean = box_mean(img, radius)
    imgf = img.astype(jnp.float32)
    if black_on_white:
        return imgf < mean * at_threshold
    return imgf > mean * (2.0 - at_threshold)
