"""Resolution-metric tests (C9)."""

import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms.metrics import (
    fwhm_1d,
    fwhm_2d,
    system_resolution_report,
)
from rescan_line_sted_tpu.config import LineSTEDParams, PointSTEDParams
from rescan_line_sted_tpu.physics import psf as psfs


def test_fwhm_gaussian():
    sigma = 3.0
    prof = psfs.gaussian_psf((1, 129), sigma)[0]
    expected = 2.0 * np.sqrt(2.0 * np.log(2.0)) * sigma
    assert abs(float(fwhm_1d(prof)) - expected) < 0.05


def test_fwhm_2d_anisotropic():
    y = jnp.arange(65.0)[:, None] - 32
    x = jnp.arange(65.0)[None, :] - 32
    k = jnp.exp(-(y**2) / (2 * 4.0**2) - (x**2) / (2 * 2.0**2))
    fy, fx = fwhm_2d(k)
    assert abs(float(fy) / float(fx) - 2.0) < 0.05


def test_sted_improves_point_resolution():
    shape = (96, 96)
    base = dict(sigma_exc=3.0, sigma_det=3.0, sigma_dep=3.0,
                pinhole_radius=3.0)
    r0 = system_resolution_report(shape, PointSTEDParams.create(
        depletion=0.0, **base))
    r8 = system_resolution_report(shape, PointSTEDParams.create(
        depletion=8.0, **base))
    assert float(r8.fwhm_x) < 0.6 * float(r0.fwhm_x)
    assert float(r8.fwhm_y) < 0.6 * float(r0.fwhm_y)


def test_line_sted_kernel_is_anisotropic():
    shape = (96, 96)
    rep = system_resolution_report(shape, LineSTEDParams.create(
        sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0, depletion=8.0,
        slit_halfwidth=3.0))
    # STED sharpens only the scan axis (x); the line axis (y) stays wide.
    assert float(rep.fwhm_x) < 0.7 * float(rep.fwhm_y)


def test_fwhm_1d_guards_against_contract_violations():
    """Multi-lobed / flat / non-positive profiles return NaN, never a
    plausible-looking wrong number (VERDICT r1 weak 4)."""
    x = jnp.arange(64, dtype=jnp.float32)
    two_lobes = (jnp.exp(-0.5 * ((x - 20) / 2) ** 2)
                 + 0.9 * jnp.exp(-0.5 * ((x - 44) / 2) ** 2))
    assert np.isnan(float(fwhm_1d(two_lobes)))
    assert np.isnan(float(fwhm_1d(jnp.ones(64))))
    assert np.isnan(float(fwhm_1d(jnp.zeros(64))))
    assert np.isnan(float(fwhm_1d(-jnp.ones(64))))
    # a clean single peak still measures correctly
    single = jnp.exp(-0.5 * ((x - 32) / 3.0) ** 2)
    np.testing.assert_allclose(float(fwhm_1d(single)), 2.3548 * 3.0,
                               rtol=1e-2)


def test_matmul_precision_knob(monkeypatch):
    import jax

    from rescan_line_sted_tpu.config import matmul_precision

    monkeypatch.delenv("RLS_MATMUL_PRECISION", raising=False)
    assert matmul_precision() == jax.lax.Precision.HIGHEST
    monkeypatch.setenv("RLS_MATMUL_PRECISION", "default")
    assert matmul_precision() == jax.lax.Precision.DEFAULT
    monkeypatch.setenv("RLS_MATMUL_PRECISION", "high")
    assert matmul_precision() == jax.lax.Precision.HIGH
    # Mosaic has no in-kernel 3-pass dots: pallas callers get HIGHEST
    assert matmul_precision(pallas=True) == jax.lax.Precision.HIGHEST
