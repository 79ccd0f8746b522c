"""Randomized oracle-parity fuzzing: random physics params on small grids.

A light fuzz sweep over the parameter space (PSF widths, depletion strength,
detector sizes, grid shapes) asserting the 1e-5 oracle-parity bar holds
everywhere, not just at the hand-picked test points.
"""

import numpy as np
import pytest

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
)
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import line_sted_image, point_sted_image
from tests.oracle import oracle


def rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_line_sted(seed):
    rng = np.random.default_rng(seed)
    shape = tuple(rng.choice([24, 32, 40, 48], size=2))
    kw = dict(
        sigma_exc=float(rng.uniform(1.0, 4.0)),
        sigma_det=float(rng.uniform(1.0, 4.0)),
        stripe_period=float(rng.uniform(5.0, 16.0)),
        depletion=float(rng.uniform(0.0, 20.0)),
        slit_halfwidth=float(rng.uniform(1.0, 5.0)),
        brightness=float(rng.uniform(0.5, 200.0)),
    )
    sample = samples.rings(shape, period=float(rng.uniform(6.0, 14.0)))
    geom = LineSTEDGeometry(Grid(*shape), chunk=int(shape[1]))
    params = LineSTEDParams.create(**kw)
    want = oracle.line_sted_image(np.asarray(sample, np.float64), **kw)
    for method in ("analytic", "scan"):
        got = line_sted_image(sample, params, geom, method=method).image
        assert rel_err(got, want) < 1e-5, (method, kw, shape)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_point_sted(seed):
    rng = np.random.default_rng(100 + seed)
    shape = (int(rng.choice([24, 32])),) * 2
    kw = dict(
        sigma_exc=float(rng.uniform(1.0, 3.5)),
        sigma_det=float(rng.uniform(1.0, 3.5)),
        sigma_dep=float(rng.uniform(1.0, 3.5)),
        depletion=float(rng.uniform(0.0, 15.0)),
        pinhole_radius=float(rng.uniform(1.0, 5.0)),
        brightness=float(rng.uniform(0.5, 100.0)),
    )
    sample = samples.siemens_star(shape, spokes=int(rng.integers(4, 10)))
    geom = PointSTEDGeometry(Grid(*shape), chunk=shape[0] * shape[1] // 4)
    params = PointSTEDParams.create(**kw)
    want = oracle.point_sted_image(np.asarray(sample, np.float64), **kw)
    for method in ("analytic", "scan"):
        got = point_sted_image(sample, params, geom, method=method).image
        assert rel_err(got, want) < 1e-5, (method, kw)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_rescan_fractional_R_binning(seed):
    """Random fractional rescan factors x binnings x physics params: both
    engines hold the 1e-5 bar against the f64 subpixel oracle (the scan
    engine on the raw sample -- shared wrap semantics -- and the analytic
    closed form on an x-padded sample, per its documented seam caveat)."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    rng = np.random.default_rng(100 + seed)
    b = int(rng.choice([1, 2, 4]))
    size = int(rng.choice([32, 48])) if b != 4 else 32
    r = float(rng.uniform(1.2, 4.0))
    kw = dict(
        sigma_exc=float(rng.uniform(1.0, 3.0)),
        sigma_det=float(rng.uniform(1.0, 3.0)),
        stripe_period=float(rng.uniform(5.0, 14.0)),
        depletion=float(rng.uniform(0.0, 16.0)),
        brightness=float(rng.uniform(0.5, 100.0)),
    )
    sample = samples.rings((size, size), period=float(rng.uniform(6.0, 12.0)))
    geom = RescanGeometry(Grid(size, size), rescan_factor=r, binning=b,
                          chunk=size // 2)
    params = LineSTEDParams.create(slit_halfwidth=3.0, **kw)

    # scan engine shares the oracle's wrap semantics: raw sample, any params
    want = oracle.rescanned_line_sted_image(
        np.asarray(sample, np.float64), rescan_factor=r, binning=b,
        reassignment="subpixel", **kw)
    got = rescanned_line_sted_image(sample, params, geom,
                                    method="scan").image
    assert rel_err(got, want) < 1e-5, ("scan", r, b, kw)

    # analytic closed form carries the circular-seam caveat: the sample
    # must be zero within ~PSF support of its x-edges, so re-draw the
    # sigmas small enough that a size//4 margin holds 1e-5 (Gaussian tail
    # below 1e-5 needs ~4.8 sigma of margin)
    max_sigma = (size // 4) / 5.5
    kw["sigma_exc"] = float(rng.uniform(0.8, max_sigma))
    kw["sigma_det"] = float(rng.uniform(0.8, max_sigma))
    params = LineSTEDParams.create(slit_halfwidth=3.0, **kw)
    margin = size // 4
    mask = (np.arange(size) >= margin) & (np.arange(size) < size - margin)
    padded = sample * mask[None, :]
    want_p = oracle.rescanned_line_sted_image(
        np.asarray(padded, np.float64), rescan_factor=r, binning=b,
        reassignment="subpixel", **kw)
    got_p = rescanned_line_sted_image(padded, params, geom,
                                      method="analytic").image
    assert rel_err(got_p, want_p) < 1e-5, ("analytic", r, b, kw)


@pytest.mark.parametrize("seed", (400, 403))
def test_fuzz_banded_point_per_step(seed):
    """The banded-window per-step point engine in the regime where the band
    actually engages (supports small vs width: 256^2, see _point_band's
    d_in < w gate -- the small-grid fuzz above never reaches it)."""
    from rescan_line_sted_tpu.imaging.point_sted import (
        _banded_point_scan,
        _point_band,
    )
    from rescan_line_sted_tpu.physics import psf as psfs
    from rescan_line_sted_tpu.physics.models import effective_point_psf

    import jax

    rng = np.random.default_rng(seed)
    n = 256
    chunk = int(rng.choice([32, 64]))
    kw = dict(sigma_exc=float(rng.uniform(1.0, 2.0)),
              sigma_det=float(rng.uniform(1.0, 2.0)),
              sigma_dep=float(rng.uniform(1.0, 2.0)),
              depletion=float(rng.uniform(0.0, 20.0)),
              pinhole_radius=float(rng.uniform(1.0, 3.0)),
              brightness=float(rng.uniform(0.5, 200.0)))
    params = PointSTEDParams.create(**kw)
    geom = PointSTEDGeometry(Grid(n, n), chunk=chunk)
    band = _point_band(params, n, n, chunk)
    assert band is not None, (chunk, kw)
    sample = samples.siemens_star((n, n))
    eff = effective_point_psf((n, n), params)
    pin = psfs.pinhole_mask((n, n), params.pinhole_radius)
    got = _banded_point_scan(sample, params, geom, jax.random.key(0),
                             eff, pin, band, draw_noise=False)
    want = point_sted_image(sample, params, geom, key=None,
                            method="scan").image
    assert rel_err(got, want) < 1e-5, (seed, chunk, kw, band)
