"""Unit tests for PSF synthesis and the depletion nonlinearity (C1, C2)."""

import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.physics import psf as psfs
from tests.oracle import oracle


SHAPE = (64, 64)


def test_gaussian_peak_and_symmetry():
    g = np.asarray(psfs.gaussian_psf(SHAPE, 3.0))
    assert g[32, 32] == 1.0
    # circularly even: g(v) == g(-v)
    flipped = np.roll(g[::-1, ::-1], (1, 1), axis=(0, 1))
    np.testing.assert_allclose(g, flipped, rtol=0, atol=1e-7)


def test_donut_null_and_ring():
    d = np.asarray(psfs.donut_psf(SHAPE, 3.0))
    assert d[32, 32] == 0.0
    # peak 1 on the ring r = sigma * sqrt(2)
    assert abs(d.max() - 1.0) < 1e-3
    r_peak = 3.0 * np.sqrt(2.0)
    assert abs(d[32, 32 + int(round(r_peak))] - 1.0) < 0.02


def test_stripe_zero_on_line():
    s = np.asarray(psfs.stripe_depletion_profile(64, 8.0))
    assert s[32] == 0.0
    assert abs(s[32 + 4] - 1.0) < 1e-6  # first max at period/2


def test_effective_psf_s0_is_confocal():
    exc = psfs.gaussian_psf(SHAPE, 2.0)
    dep = psfs.donut_psf(SHAPE, 2.0)
    eff = psfs.effective_psf(exc, dep, 0.0)
    np.testing.assert_allclose(np.asarray(eff), np.asarray(exc), atol=1e-7)


def test_effective_psf_preserves_donut_null_peak():
    exc = psfs.gaussian_psf(SHAPE, 2.0)
    dep = psfs.donut_psf(SHAPE, 2.0)
    eff = np.asarray(psfs.effective_psf(exc, dep, 20.0))
    assert eff[32, 32] == 1.0          # donut null leaves the peak untouched
    assert eff.max() == eff[32, 32]
    # strong depletion narrows the PSF
    assert eff.sum() < 0.2 * np.asarray(exc).sum()


def test_effective_psf_narrows_like_sqrt_1_plus_s():
    # near r=0: eff ~ exp(-r^2/2 * (1/se^2 + s*e/sd^2))
    shape = (129, 129)
    se = sd = 4.0
    for s in (0.0, 3.0, 8.0):
        exc = psfs.gaussian_psf(shape, se)
        dep = psfs.donut_psf(shape, sd)
        eff = np.asarray(psfs.effective_psf(exc, dep, s))
        profile = eff[64]
        sigma_eff_sq_inv = 1.0 / se**2 + s * np.e / sd**2
        expected = np.exp(-0.5 * sigma_eff_sq_inv)  # value 1 px from peak
        assert abs(profile[65] - expected) < 0.02


def test_detection_psf_normalized():
    det = psfs.detection_psf(SHAPE, 2.5)
    assert abs(float(jnp.sum(det)) - 1.0) < 1e-6


def test_psfs_match_oracle():
    for jx, npy in [
        (psfs.gaussian_psf(SHAPE, 2.7), oracle.gaussian_psf(SHAPE, 2.7)),
        (psfs.donut_psf(SHAPE, 3.1), oracle.donut_psf(SHAPE, 3.1)),
        (psfs.detection_psf(SHAPE, 2.0), oracle.detection_psf(SHAPE, 2.0)),
        (psfs.line_excitation_profile(64, 2.0),
         oracle.line_excitation_profile(64, 2.0)),
        (psfs.stripe_depletion_profile(64, 9.0),
         oracle.stripe_depletion_profile(64, 9.0)),
        (psfs.pinhole_mask(SHAPE, 4.0), oracle.pinhole_mask(SHAPE, 4.0)),
        (psfs.slit_profile(64, 3.0), oracle.slit_profile(64, 3.0)),
    ]:
        np.testing.assert_allclose(np.asarray(jx, np.float64), npy,
                                   rtol=1e-5, atol=1e-6)
