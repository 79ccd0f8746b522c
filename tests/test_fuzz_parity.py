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
