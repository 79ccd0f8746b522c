"""Poisson shot-noise statistics (C7; SURVEY.md section 5.2: noise is
validated statistically, parity is defined on the noise-free mean)."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.config import Grid, LineSTEDGeometry, LineSTEDParams
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import line_sted_image
from rescan_line_sted_tpu.physics.noise import poisson_counts


def test_poisson_mean_and_variance():
    mean = jnp.full((200, 200), 7.3)
    counts = poisson_counts(jax.random.key(0), mean)
    arr = np.asarray(counts)
    # Poisson(7.3): mean == var == 7.3; 40k samples -> ~1% standard error
    assert abs(arr.mean() - 7.3) < 0.1
    assert abs(arr.var() - 7.3) < 0.2
    assert (arr == np.round(arr)).all()  # integer counts


def test_noisy_image_mean_matches_noise_free():
    """Averaged noisy acquisitions converge to the noise-free image."""
    shape = (32, 32)
    sample = samples.rings(shape, period=10.0)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)
    params = LineSTEDParams.create(depletion=4.0, brightness=50.0)
    nf = np.asarray(line_sted_image(sample, params, geom).image)

    n = 64
    keys = jax.random.split(jax.random.key(1), n)
    noisy = jax.vmap(
        lambda k: line_sted_image(sample, params, geom, key=k).image)(keys)
    avg = np.asarray(jnp.mean(noisy, axis=0))
    # mean of n draws: SE = sqrt(mean/n); compare against 5 sigma per pixel
    se = np.sqrt(np.maximum(nf, 1e-3) / n)
    frac_bad = np.mean(np.abs(avg - nf) > 5 * se)
    assert frac_bad < 0.01
    # variance check on a bright region
    bright = nf > np.percentile(nf, 90)
    var = np.asarray(jnp.var(noisy, axis=0))[bright]
    ratio = var.mean() / nf[bright].mean()
    assert 0.8 < ratio < 1.2


def test_scan_and_analytic_noise_same_distribution():
    """Both paths draw from the same Poisson(noise-free mean) distribution."""
    shape = (32, 32)
    sample = samples.rings(shape, period=10.0)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)
    params = LineSTEDParams.create(depletion=4.0, brightness=50.0)
    n = 48
    keys = jax.random.split(jax.random.key(2), n)
    a = np.asarray(jax.vmap(lambda k: line_sted_image(
        sample, params, geom, key=k, method="analytic").image)(keys))
    s = np.asarray(jax.vmap(lambda k: line_sted_image(
        sample, params, geom, key=k, method="scan",
        noise_mode="per_step").image)(keys))
    # same mean and variance (within sampling error), per-image totals match
    assert abs(a.mean() - s.mean()) / a.mean() < 0.01
    assert abs(a.var(axis=0).mean() - s.var(axis=0).mean()) / a.var(axis=0).mean() < 0.1


def test_collapsed_and_per_step_noise_same_distribution():
    """noise_mode='collapsed' is distributionally identical to 'per_step'."""
    shape = (32, 32)
    sample = samples.rings(shape, period=10.0)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)
    params = LineSTEDParams.create(depletion=4.0, brightness=50.0)
    n = 48
    keys = jax.random.split(jax.random.key(3), n)
    c = np.asarray(jax.vmap(lambda k: line_sted_image(
        sample, params, geom, key=k, method="scan",
        noise_mode="collapsed").image)(keys))
    p = np.asarray(jax.vmap(lambda k: line_sted_image(
        sample, params, geom, key=k, method="scan",
        noise_mode="per_step").image)(keys))
    assert abs(c.mean() - p.mean()) / c.mean() < 0.01
    assert abs(c.var(axis=0).mean() - p.var(axis=0).mean()) / c.var(axis=0).mean() < 0.15


def test_rescan_collapsed_and_per_step_same_distribution():
    """Rescan canvas: collapsed draw == per-frame draws, distributionally
    (each camera pixel reassigns to exactly one canvas pixel)."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    shape = (32, 32)
    sample = samples.rings(shape, period=10.0)
    geom = RescanGeometry(Grid(*shape), rescan_factor=2.0, chunk=16)
    params = LineSTEDParams.create(depletion=4.0, brightness=50.0)
    n = 48
    keys = jax.random.split(jax.random.key(5), n)
    c = np.asarray(jax.vmap(lambda k: rescanned_line_sted_image(
        sample, params, geom, key=k, method="scan",
        noise_mode="collapsed").image)(keys))
    p = np.asarray(jax.vmap(lambda k: rescanned_line_sted_image(
        sample, params, geom, key=k, method="scan",
        noise_mode="per_step").image)(keys))
    assert abs(c.mean() - p.mean()) / c.mean() < 0.01
    assert abs(c.var(axis=0).mean() - p.var(axis=0).mean()) / c.var(axis=0).mean() < 0.15


def test_point_per_step_mean_matches_noise_free():
    """Point-STED per-step draws average to the noise-free image (covers
    the separable-conv per-step camera path)."""
    from rescan_line_sted_tpu.config import PointSTEDGeometry, PointSTEDParams
    from rescan_line_sted_tpu.imaging import point_sted_image

    shape = (24, 24)
    sample = samples.rings(shape, period=8.0)
    geom = PointSTEDGeometry(Grid(*shape), chunk=96)
    params = PointSTEDParams.create(depletion=3.0, brightness=40.0,
                                    sigma_exc=2.0, sigma_det=2.0,
                                    sigma_dep=2.0, pinhole_radius=2.5)
    nf = np.asarray(point_sted_image(sample, params, geom).image)
    n = 32
    keys = jax.random.split(jax.random.key(7), n)
    noisy = np.asarray(jax.vmap(lambda k: point_sted_image(
        sample, params, geom, key=k, method="scan",
        noise_mode="per_step").image)(keys))
    avg = noisy.mean(axis=0)
    se = np.sqrt(np.maximum(nf, 1e-3) / n)
    frac_bad = np.mean(np.abs(avg - nf) > 5 * se)
    assert frac_bad < 0.02
