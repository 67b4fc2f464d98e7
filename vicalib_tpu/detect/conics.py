"""Connected components + ellipse (conic) extraction, batched JAX.

Calibu ConicFinder equivalent (call sites: vicalib-task.cc:120-122, 268-272):
find dark blobs and fit ellipses, filtered by ``conic_min_area = 4``,
``conic_min_density = 0.6``, ``conic_min_aspect = 0.2``.

TPU-native design: connected-component labeling is iterative min-label
propagation (a few tens of 3x3 min-pool steps — dots are small), then blob
moments are gathered with a fixed-size ``jnp.unique`` + ``segment_sum``, so
every shape is static and the whole pipeline jits and vmaps over frames.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConicParams:
    min_area: float = 4.0
    min_density: float = 0.6
    min_aspect: float = 0.2
    max_conics: int = 512          # static K for unique/segment ops
    cc_iters: int = 64             # label-propagation sweeps


def label_components(mask, n_iters=64):
    """8-connected component labels by iterative min propagation.

    mask: (H, W) bool.  Returns (H, W) int32: 0 = background, else the
    (1-based) minimum flat index in the component.  n_iters bounds the
    in-component diameter — ample for calibration dots.
    """
    H, W = mask.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(H, W)
    big = jnp.iinfo(jnp.int32).max
    labels = jnp.where(mask, idx, big)

    def propagate(labels):
        p = jnp.pad(labels, 1, constant_values=big)
        neigh = jnp.stack([
            p[0:-2, 0:-2], p[0:-2, 1:-1], p[0:-2, 2:],
            p[1:-1, 0:-2], p[1:-1, 1:-1], p[1:-1, 2:],
            p[2:, 0:-2], p[2:, 1:-1], p[2:, 2:],
        ])
        return jnp.where(mask, jnp.min(neigh, axis=0), big)

    def body(state):
        labels, _, it = state
        new = propagate(labels)
        return new, jnp.any(new != labels), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True),
                                                   0))
    return jnp.where(mask, labels, 0)


def extract_conics(mask, labels, params: ConicParams = ConicParams(),
                   img=None):
    """Blob moments -> ellipse centers/axes with Calibu's filters.

    When ``img`` is given, centroids use darkness-weighted moments
    ((255 - I) within the component) — sub-pixel accuracy on anti-aliased
    dots far beyond binary centroids.  Shape filters still use the binary
    moments.

    Returns dict of (K,) arrays: center (K, 2) [x, y], radius (K,),
    area (K,), valid (K,) — fixed K = params.max_conics.
    """
    H, W = mask.shape
    K = params.max_conics
    flat = labels.reshape(-1)
    # compact label ids: unique with static size.  The fill must be LARGER
    # than any real label so the padded array stays sorted (searchsorted
    # depends on it); bin 0 is the background label 0.
    sentinel = jnp.iinfo(jnp.int32).max
    uniq = jnp.unique(flat, size=K + 1, fill_value=sentinel)
    comp = jnp.searchsorted(uniq, flat)                    # (H*W,) in [0, K]
    # background (label 0) maps to bin 0 since uniq[0] == 0 when any bg exists
    ys = (jnp.arange(H * W, dtype=jnp.float32) // W)
    xs = (jnp.arange(H * W, dtype=jnp.float32) % W)
    fg = (flat > 0).astype(jnp.float32)

    def seg(v):
        return jax.ops.segment_sum(v, comp, num_segments=K + 1)

    m00 = seg(fg)
    m10 = seg(fg * xs)
    m01 = seg(fg * ys)
    m20 = seg(fg * xs * xs)
    m02 = seg(fg * ys * ys)
    m11 = seg(fg * xs * ys)

    is_bg = uniq == 0
    area = m00
    denom = jnp.maximum(area, 1.0)
    cx = m10 / denom
    cy = m01 / denom

    # central second moments around the *binary* centroid (shape filters)
    mu20 = m20 / denom - cx * cx
    mu02 = m02 / denom - cy * cy
    mu11 = m11 / denom - cx * cy
    if img is not None:
        # darkness-weighted centroid for the reported center (sub-pixel)
        w = fg * (255.0 - img.astype(jnp.float32).reshape(-1))
        w00 = jnp.maximum(seg(w), 1e-6)
        cx = seg(w * xs) / w00
        cy = seg(w * ys) / w00
    # ellipse semi-axes from eigenvalues of the covariance (a = 2 sqrt(l))
    tr = mu20 + mu02
    det = mu20 * mu02 - mu11 * mu11
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    l1 = tr / 2.0 + disc
    l2 = jnp.maximum(tr / 2.0 - disc, 1e-6)
    a = 2.0 * jnp.sqrt(jnp.maximum(l1, 1e-6))
    b = 2.0 * jnp.sqrt(l2)
    aspect = b / jnp.maximum(a, 1e-6)
    density = area / jnp.maximum(jnp.pi * a * b, 1e-6)

    valid = ((~is_bg) & (area >= params.min_area)
             & (aspect >= params.min_aspect)
             & (density >= params.min_density))
    center = jnp.stack([cx, cy], axis=1)
    radius = jnp.sqrt(jnp.maximum(area, 0.0) / jnp.pi)
    # drop the background bin (index where uniq==0); keep K slots
    return {
        "center": center[1:K + 1],
        "radius": radius[1:K + 1],
        "area": area[1:K + 1],
        "valid": valid[1:K + 1],
    }


@partial(jax.jit, static_argnames=("params",))
def find_conics(img, params: ConicParams = ConicParams(),
                at_threshold=0.9, at_window_ratio=30.0):
    """Full per-frame pipeline: threshold -> CC -> conics.  Jittable; vmap
    over frames for batching."""
    from .image_proc import adaptive_threshold

    mask = adaptive_threshold(img, at_threshold, at_window_ratio)
    labels = label_components(mask, params.cc_iters)
    return extract_conics(mask, labels, params, img=img)
