"""Pallas detection kernel vs portable XLA path: exact equivalence.

The fused threshold+label kernel (detect/pallas_kernels.py) must produce the
same mask/labels — and hence identical conics — as the XLA reference path,
both operating on the same tile-padded frame.  On CPU the kernel runs in
Pallas interpret mode; the same code compiles with Mosaic on TPU.
"""
import jax.numpy as jnp
import numpy as np

from vicalib_tpu.detect.conics import (ConicParams, _pad_to_tiles,
                                       find_conics_batch)
from vicalib_tpu.detect.pallas_kernels import threshold_and_label
from vicalib_tpu.io import sim


def _frames(n=2):
    cfg = sim.default_mono_config(n_frames=n, model="linear",
                                  distance=0.42, orbit_radius=0.25)
    cfg.cameras[0].params[:4] = [240.0, 240.0, 200.0, 150.0]
    cfg.cameras[0].width = 400
    cfg.cameras[0].height = 300
    data = sim.simulate(cfg)
    return sim.render_frames(data, cam=0)


def test_kernel_matches_xla_path():
    imgs = jnp.asarray(_frames(), jnp.float32)
    padded, H, W = _pad_to_tiles(imgs)
    radius = max(int(W / 30.0 / 2), 1)

    from vicalib_tpu.detect.conics import _compact_labels_xla

    params = ConicParams(cc_iters=64)
    comp_x = _compact_labels_xla(padded, params, 0.9, radius)
    mask_p, comp_p = threshold_and_label(padded, radius, 0.9, n_iters=64,
                                         max_labels=params.max_conics,
                                         interpret=True)
    # identical compact component ids (rank-in-min-label-order) and mask
    np.testing.assert_array_equal(np.asarray(comp_p), np.asarray(comp_x))
    np.testing.assert_array_equal(np.asarray(mask_p),
                                  np.asarray(comp_x) > 0)


def test_pallas_engages_at_reference_resolution():
    """The fused kernel must be *selected* at the vi_sim frame size.

    Round 3's guard budgeted 14 MiB and silently fell back to the ~130-HBM-
    pass XLA path at exactly 800x600 (padded 600x896); the guard now
    reflects the measured v5e capacity (kernel verified on hardware up to
    1536x2048).  Parity at this resolution is asserted in interpret mode —
    the same kernel code Mosaic compiles on TPU.
    """
    from vicalib_tpu.detect.pallas_kernels import fits_vmem

    # padded 800x600 (vi_sim, /root/reference/testing/vi_sim_test.cpp:18-21)
    assert fits_vmem(600, 896)
    # and well beyond — any realistic calibration video resolution
    assert fits_vmem(1080, 1920)
    assert not fits_vmem(4000, 6000)   # genuinely VMEM-bound -> XLA path

    cfg = sim.default_mono_config(n_frames=1, model="linear",
                                  distance=0.85, orbit_radius=0.4)
    data = sim.simulate(cfg)
    imgs = jnp.asarray(sim.render_frames(data, cam=0), jnp.float32)
    assert imgs.shape[1:] == (600, 800), imgs.shape
    padded, H, W = _pad_to_tiles(imgs)
    radius = max(int(W / 30.0 / 2), 1)

    from vicalib_tpu.detect.conics import _compact_labels_xla

    params = ConicParams(cc_iters=64)
    comp_x = _compact_labels_xla(padded, params, 0.9, radius)
    mask_p, comp_p = threshold_and_label(padded, radius, 0.9, n_iters=64,
                                         max_labels=params.max_conics,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(comp_p), np.asarray(comp_x))
    assert int((np.asarray(comp_p) > 0).sum()) > 1000  # dots actually found


def test_batched_backends_agree_on_conics():
    imgs = _frames()
    params = ConicParams(max_conics=256)
    out_p = find_conics_batch(imgs, params, backend="pallas")
    out_x = find_conics_batch(imgs, params, backend="xla")
    np.testing.assert_array_equal(np.asarray(out_p["valid"]),
                                  np.asarray(out_x["valid"]))
    v = np.asarray(out_x["valid"])
    np.testing.assert_allclose(np.asarray(out_p["center"])[v],
                               np.asarray(out_x["center"])[v], atol=1e-4)


def test_batched_matches_single_frame_api():
    imgs = _frames(1)
    params = ConicParams(max_conics=256)
    out_b = find_conics_batch(imgs, params, backend="xla")
    v = np.asarray(out_b["valid"][0])
    assert v.sum() > 100
    centers = np.asarray(out_b["center"][0])[v]
    # single-frame path runs on the unpadded frame; centers must agree
    from vicalib_tpu.detect.conics import find_conics
    out_s = find_conics(jnp.asarray(imgs[0], jnp.float32), params)
    vs = np.asarray(out_s["valid"])
    cs = np.asarray(out_s["center"])[vs]
    assert len(cs) == len(centers)
    d = np.linalg.norm(centers[:, None] - cs[None], axis=2).min(1)
    assert d.max() < 0.5, d.max()
