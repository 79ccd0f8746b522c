"""Fourier Ring Correlation tests (beyond-reference data-driven resolution)."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms import frc_curve, frc_resolution
from rescan_line_sted_tpu.algorithms.frc import frc_sectored_resolution
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


def test_sectored_matches_radial_on_isotropic_images():
    """On an isotropically blurred noisy pair, each axis's sectored
    resolution agrees with the radial one to within ring granularity."""
    sample = samples.siemens_star((96, 96))
    geom = LineSTEDGeometry(Grid(96, 96), chunk=32)
    p = LineSTEDParams.create(depletion=6.0, brightness=2000.0,
                              sigma_exc=2.0, sigma_det=2.0)
    k1, k2 = jax.random.split(jax.random.key(3))
    a = line_sted_image(sample, p, geom, key=k1).image
    b = line_sted_image(sample, p, geom, key=k2).image
    radial = float(frc_resolution(a, b))
    rx, ry = jax.jit(frc_sectored_resolution)(a, b)
    assert np.isfinite(float(rx)) and np.isfinite(float(ry))
    # line-STED at one orientation is itself mildly anisotropic, so allow
    # a generous band; both axes must bracket the radial crossing scale
    assert 0.5 * radial < float(rx) < 2.5 * radial
    assert 0.5 * radial < float(ry) < 2.5 * radial


def test_sectored_detects_anisotropy():
    """Blur one axis much harder than the other: the blurred axis's
    sectored resolution must come out substantially coarser."""
    key = jax.random.key(11)
    base = samples.siemens_star((128, 128)) * 200.0
    # anisotropic Gaussian blur via separable FFT smoothing
    fy = jnp.fft.fftfreq(128)[:, None]
    fx = jnp.fft.rfftfreq(128)[None, :]
    sig_y, sig_x = 4.0, 0.8  # heavy blur along y only
    otf = jnp.exp(-2 * jnp.pi ** 2 * ((sig_y * fy) ** 2 + (sig_x * fx) ** 2))

    def acquire(k):
        blurred = jnp.fft.irfft2(jnp.fft.rfft2(base) * otf, s=(128, 128))
        return jax.random.poisson(k, jnp.maximum(blurred, 0.0)).astype(
            jnp.float32)

    k1, k2 = jax.random.split(key)
    rx, ry = frc_sectored_resolution(acquire(k1), acquire(k2))
    # resolution along y (set by the ky sector) is the blurred one
    assert float(ry) > 1.5 * float(rx)


def test_unfused_rescan_sweep_reports_per_axis_frc():
    """The dose sweep's unfused rescan arm fills frc_resolution_x/_y
    (sample px) instead of the radial column."""
    from rescan_line_sted_tpu.config import (PointSTEDGeometry,
                                             PointSTEDParams,
                                             RescanGeometry)
    from rescan_line_sted_tpu.sweeps.dose import dose_matched_sweep

    size = 64
    sample = samples.siemens_star((size, size)) * 4.0
    pgeom = PointSTEDGeometry(Grid(size, size))
    lgeom = LineSTEDGeometry(Grid(size, size), chunk=32)
    rgeom = RescanGeometry(Grid(size, size), rescan_factor=2.0, chunk=32)
    pp = PointSTEDParams.create(brightness=500.0, sigma_exc=2.0,
                                sigma_det=2.0)
    lp = LineSTEDParams.create(brightness=500.0, sigma_exc=2.0,
                               sigma_det=2.0)
    out = dose_matched_sweep(
        sample, pp, lp, pgeom, lgeom, jnp.array([0.0, 4.0]),
        dose_budget=3e5, key=jax.random.key(5), rescan_geom=rgeom,
        frc=True)
    assert out.rescan.frc_resolution is None
    assert out.rescan.frc_resolution_x.shape == (2,)
    assert out.rescan.frc_resolution_y.shape == (2,)
    fin = np.asarray(out.rescan.frc_resolution_x)
    assert np.all(np.isnan(fin) | (fin > 0))
    # fused arms keep their radial columns
    assert out.point.frc_resolution.shape == (2,)


def test_frc_is_jittable_and_vmappable():
    imgs1 = jax.random.poisson(jax.random.key(1), 20.0, (3, 48, 48)).astype(jnp.float32)
    imgs2 = jax.random.poisson(jax.random.key(2), 20.0, (3, 48, 48)).astype(jnp.float32)
    res = jax.jit(jax.vmap(frc_resolution))(imgs1, imgs2)
    assert res.shape == (3,)
