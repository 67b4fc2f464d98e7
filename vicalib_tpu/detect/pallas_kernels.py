"""Fused Pallas TPU kernel: adaptive threshold + connected-component labels.

This is the detection hot path (Calibu ImageProcessing::Process +
ConicFinder label pass; call sites vicalib-task.cc:264-272).  The pure-XLA
implementation (image_proc.py / conics.py) round-trips the full frame through
HBM once per min-propagation sweep (~64 sweeps) plus the threshold passes;
this kernel reads each frame from HBM exactly once, keeps the mask and label
image resident in VMEM for the whole iteration, and writes the labels back
once — the speed-of-light memory schedule for this op (2 frame-sized HBM
transfers instead of ~130).

Semantics are identical to the XLA path by construction: both operate on the
same edge-padded, tile-aligned frame (see ``conics.find_conics``), so the
kernel can assume H % 8 == 0 and W % 128 == 0.

Grid: one program per frame; batching over the leading axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = jnp.iinfo(jnp.int32).max


def _shift(x, d, axis, fill=0.0):
    """Shift ``x`` by +d (d may be negative) along ``axis``, filling with
    ``fill`` — static slices + concatenate only (Mosaic-lowerable)."""
    if d == 0:
        return x
    sl = [slice(None)] * x.ndim
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(d)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if d > 0:
        sl[axis] = slice(0, x.shape[axis] - d)
        return jnp.concatenate([pad, x[tuple(sl)]], axis=axis)
    sl[axis] = slice(-d, None)
    return jnp.concatenate([x[tuple(sl)], pad], axis=axis)


def _prefix_sum(x, axis):
    """Inclusive prefix sum via Hillis-Steele doubling (log2(n) shifted adds;
    Mosaic has no cumsum primitive)."""
    n = x.shape[axis]
    d = 1
    while d < n:
        x = x + _shift(x, d, axis)
        d *= 2
    return x


def _window_sum(x, r, axis):
    """Clamped sliding-window sum of half-width ``r`` along ``axis`` via
    prefix-sum differences with static shifts (no gathers)."""
    n = x.shape[axis]
    c = _prefix_sum(x, axis)
    # upper[i] = c[min(i + r, n - 1)] (edge replication), via shift by -r
    # of c with edge fill: shift then overwrite the tail with c[n-1]
    sl_last = [slice(None)] * x.ndim
    sl_last[axis] = slice(n - 1, n)
    edge = jnp.broadcast_to(c[tuple(sl_last)], c.shape)
    upper = _shift(c, -r, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, c.shape, axis)
    upper = jnp.where(idx + r > n - 1, edge, upper)
    # lower[i] = c[i - r - 1], zero when i - r - 1 < 0
    lower = _shift(c, r + 1, axis)
    return upper - lower


def _box_mean(img, r):
    """Local box mean with clamped borders — matches image_proc.box_mean."""
    H, W = img.shape
    s = _window_sum(img, r, 0)
    s = _window_sum(s, r, 1)
    # Mosaic iota must be integer-typed; cast after
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    cnt_y = jnp.minimum(iy + r, H - 1) - jnp.maximum(iy - r - 1, -1.0)
    cnt_x = jnp.minimum(ix + r, W - 1) - jnp.maximum(ix - r - 1, -1.0)
    return s / (cnt_y * cnt_x)


def _propagate_min(labels, mask):
    """One 8-connected min-label sweep (conics.label_components analog).

    The 3x3 min filter is separable: row-min then col-min — 4 shifted mins
    instead of 8."""
    big = jnp.full_like(labels, _BIG)
    r = jnp.minimum(labels, jnp.minimum(_shift(labels, 1, 0, _BIG),
                                        _shift(labels, -1, 0, _BIG)))
    m = jnp.minimum(r, jnp.minimum(_shift(r, 1, 1, _BIG),
                                   _shift(r, -1, 1, _BIG)))
    return jnp.where(mask, m, big)


def _propagate_to_fixpoint(labels, mask, n_iters):
    """Converge-early min-propagation: calibration dots settle in
    ~dot-diameter sweeps, far below the n_iters bound."""
    def cond(carry):
        _, changed, it = carry
        return changed & (it < n_iters)

    def body(carry):
        lab, _, it = carry
        new = _propagate_min(lab, mask)
        return new, jnp.any(new != lab), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True), 0))
    return labels


def _detect_kernel(img_ref, labels_ref, *, radius, at_threshold,
                   black_on_white, n_iters, max_labels):
    img = img_ref[0].astype(jnp.float32)
    H, W = img.shape
    mean = _box_mean(img, radius)
    if black_on_white:
        mask = img < mean * at_threshold
    else:
        mask = img > mean * (2.0 - at_threshold)

    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    idx = iy * W + ix + 1
    labels = _propagate_to_fixpoint(jnp.where(mask, idx, _BIG), mask,
                                    n_iters)

    # Phase 2: compact relabeling.  Each component's representative is the
    # pixel that kept its own index; its compact id is its rank among
    # representatives in flat order (== the rank of the component's min
    # label, i.e. exactly what unique+searchsorted would assign — but with
    # no sort, no gather).  Ranks propagate through the component the same
    # way the labels did.
    rep = mask & (labels == idx)
    s_x = _prefix_sum(rep.astype(jnp.int32), axis=1)
    row_tot = s_x[:, W - 1:W]
    # Mosaic can't concatenate width-1 columns — run the column prefix sum
    # on a lane-aligned (H, 128) broadcast instead
    rt128 = jnp.broadcast_to(row_tot, (H, 128))
    row_off = _prefix_sum(rt128, axis=0)[:, 0:1] - row_tot
    cid = s_x + row_off                       # inclusive rank at rep pixels
    cid = jnp.where(cid <= max_labels, cid, 0)   # overflow -> background
    compact = _propagate_to_fixpoint(jnp.where(rep, cid, _BIG), mask,
                                     n_iters)
    # mask is recoverable as labels > 0 — not emitting it halves the
    # output VMEM footprint (full-frame kernels are VMEM-capacity-bound)
    labels_ref[0] = jnp.where(mask, compact, 0)


def fits_vmem(H, W):
    """Whether one padded frame's kernel working set fits scoped VMEM.

    Budget: f32 input + int32 labels, x2 grid double-buffering, plus ~4
    frame-sized f32 temporaries for the box mean / propagation — measured
    against the 100 MiB ``vmem_limit_bytes`` the kernel requests (v5e
    exposes 128 MiB VMEM/core).  Empirically verified on a real v5e chip:
    the kernel compiles and runs (Mosaic) at 600x896 (the padded
    800x600 vi_sim frame, 16.4 MiB working set), 1024x1280, 1200x1920 and
    1536x2048 (100.7 MiB); the old 14 MiB bound was a guess that silently
    disabled the kernel at exactly the reference resolution."""
    per_frame = H * W * 4
    return (2 * 2 + 4) * per_frame <= 101 * 1024 * 1024


@partial(jax.jit,
         static_argnames=("radius", "at_threshold", "black_on_white",
                          "n_iters", "max_labels", "interpret"))
def threshold_and_label(imgs, radius, at_threshold=0.9, black_on_white=True,
                        n_iters=64, max_labels=512, interpret=False):
    """Fused adaptive threshold + CC labeling over a frame batch.

    imgs: (B, H, W) with H % 8 == 0, W % 128 == 0 (pre-pad via
    ``conics._pad_to_tiles``).  Returns (mask (B,H,W) bool, compact labels
    (B,H,W) int32; 0 = background, else the component's 1-based rank in
    min-flat-index order — components beyond ``max_labels`` map to 0).
    """
    B, H, W = imgs.shape
    assert H % 8 == 0 and W % 128 == 0, (H, W)
    kern = partial(_detect_kernel, radius=radius, at_threshold=at_threshold,
                   black_on_white=black_on_white, n_iters=n_iters,
                   max_labels=max_labels)
    kwargs = {}
    if not interpret:
        # the default 16 MiB scoped-vmem budget is tight for large frames;
        # v5e cores expose more — ask for headroom (harmless when unused)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    labels = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(imgs)
    return labels > 0, labels
