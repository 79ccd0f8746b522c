"""Rescanned point-STED (2D pixel reassignment / ISM; beyond-reference).

Parity against the independent f64 oracle's loop (rounded AND subpixel
placement), closed-form vs scan agreement at fractional R, the classic
rescan-confocal sqrt(2) resolution gain at s=0, and noise semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.config import Grid, PointSTEDParams, RescanPointGeometry
from rescan_line_sted_tpu.imaging import (
    point_sted_image,
    rescanned_point_sted_image,
)
from rescan_line_sted_tpu.imaging.rescan_point import (
    optimal_rescan_factor_point,
    rescan_point_system_kernel,
)
from tests.oracle import oracle

PARAMS = PointSTEDParams.create(sigma_exc=2.0, sigma_det=2.5, sigma_dep=2.0,
                                depletion=4.0, brightness=1.0)
KW = dict(sigma_exc=2.0, sigma_det=2.5, sigma_dep=2.0, depletion=4.0,
          brightness=1.0)


def _interior_sample(n=32):
    """Content zero within ~PSF support of every edge (both axes reassign)."""
    s = np.zeros((n, n))
    s[12:20, 13:21] = np.random.default_rng(0).uniform(0.2, 1.0, (8, 8))
    return jnp.asarray(s, jnp.float32)


def _rel(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() / np.abs(b).max()


@pytest.mark.parametrize("r,reassignment", [(2.0, "rounded"),
                                            (1.5, "subpixel")])
def test_scan_matches_oracle(r, reassignment):
    sample = _interior_sample()
    geom = RescanPointGeometry(Grid(32, 32), rescan_factor=r, chunk=32)
    got = rescanned_point_sted_image(sample, PARAMS, geom, method="scan",
                                     reassignment=reassignment).image
    want = oracle.rescanned_point_sted_image(
        np.asarray(sample, np.float64), rescan_factor=r,
        reassignment=reassignment, **KW)
    assert got.shape == want.shape == geom.canvas_shape
    assert _rel(got, want) < 1e-5


def test_scan_binned_matches_oracle():
    sample = _interior_sample()
    geom = RescanPointGeometry(Grid(32, 32), rescan_factor=2.0, binning=2,
                               chunk=32)
    got = rescanned_point_sted_image(sample, PARAMS, geom,
                                     method="scan").image
    want = oracle.rescanned_point_sted_image(
        np.asarray(sample, np.float64), rescan_factor=2.0, binning=2,
        reassignment="subpixel", **KW)
    # (R-1)/b = 0.5 is fractional: auto placement is subpixel
    assert got.shape == geom.canvas_shape
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("r", [2.0, 1.5, 1.37])
def test_analytic_matches_scan(r):
    """The closed form (4 matmuls + 1 FFT) equals the full per-position
    process at ANY rescan factor, for interior samples."""
    sample = _interior_sample()
    geom = RescanPointGeometry(Grid(32, 32), rescan_factor=r, chunk=32)
    an = rescanned_point_sted_image(sample, PARAMS, geom,
                                    method="analytic").image
    sc = rescanned_point_sted_image(sample, PARAMS, geom, method="scan",
                                    reassignment="subpixel").image
    assert _rel(an, sc) < 1e-5


@pytest.mark.parametrize("r,b", [(2.0, 2), (1.5, 2), (3.0, 4)])
def test_analytic_matches_scan_binned(r, b):
    """The b^2-residue closed form equals the per-position binned process
    at any rescan factor."""
    sample = _interior_sample()
    geom = RescanPointGeometry(Grid(32, 32), rescan_factor=r, binning=b,
                               chunk=32)
    an = rescanned_point_sted_image(sample, PARAMS, geom,
                                    method="analytic").image
    sc = rescanned_point_sted_image(sample, PARAMS, geom, method="scan",
                                    reassignment="subpixel").image
    assert an.shape == sc.shape == geom.canvas_shape
    assert _rel(an, sc) < 1e-5


def test_point_lands_at_r_times_position():
    n, r = 32, 2.0
    sample = jnp.zeros((n, n)).at[18, 13].set(1.0)
    geom = RescanPointGeometry(Grid(n, n), rescan_factor=r, chunk=32)
    canvas = np.asarray(rescanned_point_sted_image(
        sample, PARAMS, geom, method="scan").image)
    peak = np.unravel_index(canvas.argmax(), canvas.shape)
    assert abs(peak[0] - r * 18) <= 1 and abs(peak[1] - r * 13) <= 1


def test_rescan_confocal_sqrt2_gain():
    """s=0, matched widths: the ISM canvas PSF (back-scaled by R) is
    ~sqrt(2) narrower than the descanned point image of the same emitter."""
    from rescan_line_sted_tpu.algorithms.metrics import fwhm_1d
    from rescan_line_sted_tpu.config import PointSTEDGeometry

    n = 48
    p = PointSTEDParams.create(sigma_exc=3.0, sigma_det=3.0, sigma_dep=3.0,
                               depletion=0.0, pinhole_radius=20.0,
                               brightness=1.0)
    sample = jnp.zeros((n, n)).at[n // 2, n // 2].set(1.0)
    geom = RescanPointGeometry(Grid(n, n), rescan_factor=2.0, chunk=48)
    canvas = rescanned_point_sted_image(sample, p, geom).image
    rescan_fwhm = float(fwhm_1d(canvas[n])) / 2.0   # canvas row of R*c, /R
    conf = point_sted_image(sample, p,
                            PointSTEDGeometry(Grid(n, n), chunk=48)).image
    conf_fwhm = float(fwhm_1d(conf[n // 2]))
    # wide-pinhole confocal width = sqrt(2)*sigma*2.355; ISM recovers 1/sqrt2
    assert rescan_fwhm < conf_fwhm / 1.30
    assert rescan_fwhm > conf_fwhm / 1.55


def test_optimal_rescan_factor_point():
    p0 = PointSTEDParams.create(sigma_exc=3.0, sigma_det=3.0, sigma_dep=3.0,
                                depletion=0.0)
    r0 = float(optimal_rescan_factor_point(p0, 64))
    assert 1.9 < r0 < 2.1  # matched widths -> classic R = 2
    p8 = p0.replace(depletion=jnp.float32(8.0))
    assert float(optimal_rescan_factor_point(p8, 64)) > r0  # STED pushes R up


def test_system_kernel_predicts_canvas():
    """canvas == brightness * conv(place_2d(sample, R), H) for integer R."""
    from rescan_line_sted_tpu.kernels import fftconv

    n, r = 32, 2.0
    sample = _interior_sample(n)
    geom = RescanPointGeometry(Grid(n, n), rescan_factor=r, chunk=32)
    hk = rescan_point_system_kernel(geom, PARAMS)
    hc, wc = geom.canvas_shape
    placed = jnp.zeros((hc, wc)).at[
        (jnp.arange(n) * 2)[:, None].repeat(n, 1),
        (jnp.arange(n) * 2)[None, :].repeat(n, 0)].set(sample)
    via_kernel = PARAMS.brightness * fftconv.fft_convolve(placed, hk)
    direct = rescanned_point_sted_image(sample, PARAMS, geom).image
    assert _rel(via_kernel, direct) < 1e-5


def test_noise_modes_and_determinism():
    sample = _interior_sample() * 50.0
    geom = RescanPointGeometry(Grid(32, 32), rescan_factor=2.0, chunk=32)
    mean = rescanned_point_sted_image(sample, PARAMS, geom,
                                      method="scan").image
    draws = np.stack([np.asarray(rescanned_point_sted_image(
        sample, PARAMS, geom, key=jax.random.key(i), method="scan",
        noise_mode="per_step").image) for i in range(10)])
    sel = np.asarray(mean) > np.asarray(mean).max() * 0.3
    rel = np.abs(draws.mean(0)[sel] - np.asarray(mean)[sel]).mean() \
        / np.asarray(mean)[sel].mean()
    assert rel < 0.1
    a = rescanned_point_sted_image(sample, PARAMS, geom,
                                   key=jax.random.key(3), method="scan",
                                   noise_mode="per_step").image
    b = rescanned_point_sted_image(sample, PARAMS, geom,
                                   key=jax.random.key(3), method="scan",
                                   noise_mode="per_step").image
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ism_deconvolve_sharpens_and_converges():
    """Canvas-grid RL with the (nonnegative) reassigned system kernel: the
    re-blurred estimate converges to the canvas and emitters re-localize at
    R * position, sharper than the raw canvas."""
    from rescan_line_sted_tpu.algorithms import ism_deconvolve
    from rescan_line_sted_tpu.imaging import rescan_point_canvas_mean
    from rescan_line_sted_tpu.kernels import fftconv

    n = 32
    sample = jnp.zeros((n, n)).at[12, 14].set(1.0).at[20, 18].set(0.7)
    geom = RescanPointGeometry(Grid(n, n), rescan_factor=2.0, chunk=32)
    canvas = rescan_point_canvas_mean(sample, PARAMS, geom)
    kern = rescan_point_system_kernel(geom, PARAMS)
    est = ism_deconvolve(canvas, PARAMS, geom, num_iter=100)
    pred = fftconv.fft_convolve(est, kern)
    resid = float(jnp.linalg.norm(pred - canvas) / jnp.linalg.norm(canvas))
    assert resid < 0.10, resid  # spike targets converge slowly but monotonely
    # more iterations keep improving (monotone RL, no divergence)
    est300 = ism_deconvolve(canvas, PARAMS, geom, num_iter=300)
    resid300 = float(jnp.linalg.norm(fftconv.fft_convolve(est300, kern)
                                     - canvas) / jnp.linalg.norm(canvas))
    assert resid300 < resid
    e = np.asarray(est)
    assert np.unravel_index(e.argmax(), e.shape) == (24, 28)  # R * (12, 14)
    assert e[40, 36] > 0.4 * e.max()                          # R * (20, 18)
    # sharper than the raw canvas: mass concentrates
    c = np.asarray(canvas)
    assert e.max() / e.sum() > 3.0 * c.max() / c.sum()


def test_padded_boundary_2d_crop():
    """boundary='padded' crops BOTH rescanned axes back to the field."""
    n = 32
    sample = jnp.zeros((n, n)).at[4, 16].set(1.0)  # near the y edge
    geom = RescanPointGeometry(Grid(n, n), rescan_factor=2.0, chunk=32)
    res = rescanned_point_sted_image(sample, PARAMS, geom, method="analytic",
                                     boundary="padded", margin=16)
    assert res.image.shape == geom.canvas_shape
    canvas = np.asarray(res.image)
    peak = np.unravel_index(canvas.argmax(), canvas.shape)
    assert abs(peak[0] - 8) <= 1 and abs(peak[1] - 32) <= 1
    # circular: the near-edge emitter's tail wraps to the canvas bottom;
    # padded: it does not
    circ = np.asarray(rescanned_point_sted_image(sample, PARAMS, geom,
                                                 method="analytic").image)
    assert circ[-2:].sum() > 1e3 * max(canvas[-2:].sum(), 1e-12)
    assert float(res.dose.num_steps) == n * n


def test_practical_rescan_factor_point():
    from rescan_line_sted_tpu.imaging.rescan_point import (
        practical_rescan_factor_point,
    )

    p8 = PointSTEDParams.create(depletion=8.0)
    r_opt = float(optimal_rescan_factor_point(p8, 64))
    r_prac = float(practical_rescan_factor_point(p8, 64))
    assert 1.0 < r_prac < r_opt
    assert float(practical_rescan_factor_point(p8, 64, cap=2.0)) == 2.0
    # default snap rounds up to a 1/8 multiple, never past the optimum
    r_cont = float(practical_rescan_factor_point(p8, 64, snap=None))
    assert abs(r_prac * 8 - round(r_prac * 8)) < 1e-5
    assert r_cont <= r_prac <= min(r_cont + 0.125, r_opt) + 1e-5
