"""End-to-end engine parity: scan path == analytic path == numpy oracle.

BASELINE configs 1-3 on small grids, noise-free (<= 1e-5 relative error;
noise is validated statistically in test_noise.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import (
    line_sted_image,
    point_sted_image,
    rescanned_line_sted_image,
)
from tests.oracle import oracle


def rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)


SHAPE = (48, 48)
SAMPLE = samples.siemens_star(SHAPE, spokes=8)
SAMPLE_NP = np.asarray(SAMPLE, np.float64)


POINT_PARAMS = dict(sigma_exc=2.0, sigma_det=2.5, sigma_dep=2.0,
                    depletion=4.0, pinhole_radius=3.0, brightness=50.0)
LINE_PARAMS = dict(sigma_exc=2.0, sigma_det=2.5, stripe_period=9.0,
                   depletion=4.0, slit_halfwidth=3.0, brightness=50.0)


@pytest.mark.parametrize("method", ["analytic", "scan"])
def test_point_sted_vs_oracle(method):
    geom = PointSTEDGeometry(Grid(*SHAPE), chunk=48)
    params = PointSTEDParams.create(**POINT_PARAMS)
    got = point_sted_image(SAMPLE, params, geom, key=None, method=method).image
    want = oracle.point_sted_image(SAMPLE_NP, **POINT_PARAMS)
    assert rel_err(got, want) < 1e-5


@pytest.mark.parametrize("method", ["analytic", "scan"])
def test_line_sted_vs_oracle(method):
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    params = LineSTEDParams.create(**LINE_PARAMS)
    got = line_sted_image(SAMPLE, params, geom, key=None, method=method).image
    want = oracle.line_sted_image(SAMPLE_NP, **LINE_PARAMS)
    assert rel_err(got, want) < 1e-5


def test_rescan_scan_vs_oracle():
    rescan_kwargs = {k: v for k, v in LINE_PARAMS.items()
                     if k != "slit_halfwidth"}
    geom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, binning=2, chunk=16)
    params = LineSTEDParams.create(**LINE_PARAMS)
    got = rescanned_line_sted_image(SAMPLE, params, geom, key=None,
                                    method="scan").image
    want = oracle.rescanned_line_sted_image(
        SAMPLE_NP, rescan_factor=2.0, binning=2, **rescan_kwargs)
    assert got.shape == want.shape == (24, 48)
    assert rel_err(got, want) < 1e-5


def test_rescan_analytic_matches_scan_for_padded_sample():
    """Analytic rescan == scan rescan when the sample has zero x-margins.

    The closed-form upsample-convolution model differs from the per-step
    process only through circular wrap (sample-seam illumination vs canvas
    wrap); with the sample zero within ~PSF support of its x-edges both
    paths agree everywhere on the canvas (see imaging/analytic.py).
    """
    mask = (jnp.arange(SHAPE[1]) >= 12) & (jnp.arange(SHAPE[1]) < 36)
    padded = SAMPLE * mask[None, :]
    geom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, binning=1, chunk=16)
    params = LineSTEDParams.create(**LINE_PARAMS)
    scan = rescanned_line_sted_image(padded, params, geom, method="scan").image
    ana = rescanned_line_sted_image(padded, params, geom,
                                    method="analytic").image
    assert rel_err(ana, scan) < 1e-5


def test_rescan_point_source_lands_at_R_x0():
    """A point emitter at column a appears at canvas column ~ R * a."""
    shape = (32, 32)
    sample = jnp.zeros(shape).at[16, 10].set(1.0)
    geom = RescanGeometry(Grid(*shape), rescan_factor=2.0, binning=1, chunk=16)
    params = LineSTEDParams.create(sigma_exc=1.5, sigma_det=1.5,
                                   depletion=0.0, brightness=100.0)
    canvas = np.asarray(
        rescanned_line_sted_image(sample, params, geom, method="scan").image)
    peak_col = np.unravel_index(canvas.argmax(), canvas.shape)[1]
    assert abs(peak_col - 20) <= 1


def test_line_sted_s0_equals_no_depletion():
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    p0 = LineSTEDParams.create(**{**LINE_PARAMS, "depletion": 0.0})
    img0 = line_sted_image(SAMPLE, p0, geom).image
    # s=0 -> stripe pattern irrelevant
    p1 = LineSTEDParams.create(**{**LINE_PARAMS, "depletion": 0.0,
                                  "stripe_period": 30.0})
    img1 = line_sted_image(SAMPLE, p1, geom).image
    assert rel_err(img0, img1) < 1e-6
