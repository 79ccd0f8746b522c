"""Non-square and odd grid shapes: catch H/W swaps and center-convention bugs."""

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


POINT_PARAMS = dict(sigma_exc=2.0, sigma_det=2.0, sigma_dep=2.0,
                    depletion=3.0, pinhole_radius=2.5, brightness=10.0)
LINE_PARAMS = dict(sigma_exc=2.0, sigma_det=2.0, stripe_period=8.0,
                   depletion=3.0, slit_halfwidth=2.5, brightness=10.0)


@pytest.mark.parametrize("shape", [(32, 48), (48, 32), (33, 47)])
@pytest.mark.parametrize("method", ["analytic", "scan"])
def test_point_nonsquare(shape, method):
    sample = samples.rings(shape, period=9.0)
    geom = PointSTEDGeometry(Grid(*shape), chunk=shape[0] * shape[1] // 4
                             if (shape[0] * shape[1]) % 4 == 0 else 1)
    params = PointSTEDParams.create(**POINT_PARAMS)
    got = point_sted_image(sample, params, geom, method=method).image
    want = oracle.point_sted_image(np.asarray(sample, np.float64),
                                   **POINT_PARAMS)
    assert rel_err(got, want) < 1e-5


@pytest.mark.parametrize("shape", [(32, 48), (48, 32), (33, 47)])
@pytest.mark.parametrize("method", ["analytic", "scan"])
def test_line_nonsquare(shape, method):
    sample = samples.rings(shape, period=9.0)
    chunk = shape[1] if shape[1] % 2 else shape[1] // 2
    geom = LineSTEDGeometry(Grid(*shape), chunk=chunk)
    params = LineSTEDParams.create(**LINE_PARAMS)
    got = line_sted_image(sample, params, geom, method=method).image
    want = oracle.line_sted_image(np.asarray(sample, np.float64),
                                  **LINE_PARAMS)
    assert rel_err(got, want) < 1e-5


@pytest.mark.parametrize("shape", [(32, 48), (48, 32)])
def test_rescan_nonsquare(shape):
    sample = samples.rings(shape, period=9.0)
    geom = RescanGeometry(Grid(*shape), rescan_factor=2.0, binning=2,
                          chunk=shape[1] // 2)
    params = LineSTEDParams.create(**LINE_PARAMS)
    kwargs = {k: v for k, v in LINE_PARAMS.items() if k != "slit_halfwidth"}
    got = rescanned_line_sted_image(sample, params, geom, method="scan").image
    # R=2, binning=2 gives half-integer offsets: the engine's "auto"
    # reassignment picks exact subpixel placement
    want = oracle.rescanned_line_sted_image(
        np.asarray(sample, np.float64), rescan_factor=2.0, binning=2,
        reassignment="subpixel", **kwargs)
    assert got.shape == want.shape
    assert rel_err(got, want) < 1e-5
