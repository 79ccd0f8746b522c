"""Fused rescan megakernel: parity with the lax.scan engine (interpret mode)."""

import jax
import numpy as np
import pytest

from rescan_line_sted_tpu.config import Grid, RescanGeometry, RescanParams
from rescan_line_sted_tpu.data import samples


SHAPE = (32, 32)
SAMPLE = samples.rings(SHAPE, period=10.0)
PARAMS = RescanParams.create(sigma_exc=2.0, sigma_det=2.0, stripe_period=8.0,
                             depletion=4.0, brightness=40.0)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


@pytest.mark.parametrize("rescan_factor", [2.0, 3.0])
def test_fused_matches_unfused(rescan_factor):
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    geom = RescanGeometry(Grid(*SHAPE), rescan_factor=rescan_factor, chunk=16)
    want = rescanned_line_sted_image(SAMPLE, PARAMS, geom, method="scan",
                                     use_pallas=False).image
    got = rescanned_line_sted_image(SAMPLE, PARAMS, geom, method="scan",
                                    use_pallas=True).image
    assert rel_err(got, want) < 2e-6


def test_fused_noise_is_collapsed_poisson():
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    geom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, chunk=16)
    key = jax.random.key(4)
    noisy = np.asarray(rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, key=key, method="scan", use_pallas=True).image)
    clean = np.asarray(rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True).image)
    assert (noisy == np.round(noisy)).all()
    assert abs(noisy.sum() / clean.sum() - 1.0) < 0.02


def test_fused_kernel_direct():
    """Drive rescan_fused directly against a numpy reimplementation."""
    from rescan_line_sted_tpu.kernels.rescan_fused import rescan_fused

    rng = np.random.default_rng(0)
    h, w, wc = 16, 24, 48
    sample_y = rng.uniform(size=(h, w)).astype(np.float32)
    eff = rng.uniform(size=(w,)).astype(np.float32)
    gx_mat = rng.uniform(size=(w, w)).astype(np.float32)
    offsets = rng.integers(0, wc, size=(w,)).astype(np.int32)
    got = np.asarray(rescan_fused(sample_y, eff, gx_mat, offsets, wc))

    want = np.zeros((h, wc))
    for i in range(w):
        ill = np.roll(eff, i - w // 2)  # peak moved to column i
        cam = (sample_y * ill[None, :]) @ gx_mat
        cols = (offsets[i] + np.arange(w)) % wc
        want[:, cols] += cam
    assert rel_err(got, want) < 1e-5


def test_fused_with_binning_matches_unfused():
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    geom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, binning=2,
                          chunk=16)
    want = rescanned_line_sted_image(SAMPLE, PARAMS, geom, method="scan",
                                     use_pallas=False).image
    got = rescanned_line_sted_image(SAMPLE, PARAMS, geom, method="scan",
                                    use_pallas=True).image
    assert got.shape == want.shape == (16, 32)
    assert rel_err(got, want) < 2e-6


def test_narrow_canvas_routes_to_scan_engine():
    """rescan_factor close to 1 makes the padded fused frame wider than the
    canvas; the engine must fall back to the lax.scan path, not raise."""
    import jax.numpy as jnp

    from rescan_line_sted_tpu.config import Grid, RescanGeometry, RescanParams
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    sample = jnp.zeros((48, 48)).at[24, 24].set(1.0)
    geom = RescanGeometry(Grid(48, 48), rescan_factor=1.1, chunk=16)
    params = RescanParams.create(brightness=10.0)
    res = rescanned_line_sted_image(sample, params, geom, method="scan",
                                    use_pallas=True)
    img = res.image
    assert img.shape == geom.canvas_shape
    assert float(img.sum()) > 0
