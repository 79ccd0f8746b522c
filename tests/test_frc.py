"""Fourier Ring Correlation tests (beyond-reference data-driven resolution)."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms import frc_curve, frc_resolution
from rescan_line_sted_tpu.config import Grid, LineSTEDGeometry, LineSTEDParams
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import line_sted_image


def test_identical_images_have_unit_frc():
    img = samples.siemens_star((64, 64))
    freqs, frc = frc_curve(img, img)
    assert freqs.shape == frc.shape and freqs.shape[0] >= 48
    np.testing.assert_allclose(np.asarray(frc), 1.0, atol=1e-4)
    assert np.isnan(float(frc_resolution(img, img)))  # beyond Nyquist


def test_independent_noise_has_no_frc():
    k1, k2 = jax.random.split(jax.random.key(0))
    a = jax.random.normal(k1, (64, 64))
    b = jax.random.normal(k2, (64, 64))
    _, frc = frc_curve(a, b)
    assert np.abs(np.asarray(frc)[1:]).mean() < 0.2


def test_frc_resolution_tracks_depletion():
    """Two independent noisy line-STED acquisitions: the FRC resolution
    improves (shrinks) with STED power and is finite, and a brighter
    acquisition resolves more than a dim one."""
    size = 96
    sample = samples.siemens_star((size, size))
    geom = LineSTEDGeometry(Grid(size, size), chunk=32)

    def two(depletion, brightness):
        p = LineSTEDParams.create(depletion=depletion, brightness=brightness,
                                  sigma_exc=2.0, sigma_det=2.0)
        k1, k2 = jax.random.split(jax.random.key(7))
        a = line_sted_image(sample, p, geom, key=k1).image
        b = line_sted_image(sample, p, geom, key=k2).image
        return float(frc_resolution(a, b))

    confocal = two(0.0, 2000.0)
    sted = two(12.0, 2000.0)
    assert np.isfinite(confocal) and np.isfinite(sted)
    assert sted < confocal  # sharper PSF -> finer resolved frequency
    dim = two(12.0, 5.0)
    assert np.isnan(dim) or dim > sted  # photon-starved resolves less


def test_frc_is_jittable_and_vmappable():
    imgs1 = jax.random.poisson(jax.random.key(1), 20.0, (3, 48, 48)).astype(jnp.float32)
    imgs2 = jax.random.poisson(jax.random.key(2), 20.0, (3, 48, 48)).astype(jnp.float32)
    res = jax.jit(jax.vmap(frc_resolution))(imgs1, imgs2)
    assert res.shape == (3,)
