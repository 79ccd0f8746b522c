"""Parameter calibration through the differentiable acquisition model."""

import jax
import numpy as np

from rescan_line_sted_tpu.algorithms.calibration import fit_line_sted_params
from rescan_line_sted_tpu.config import Grid, LineSTEDGeometry, LineSTEDParams
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import line_sted_image


def test_recovers_sigma_det_and_depletion():
    shape = (48, 48)
    sample = samples.sparse_points(shape, spacing=16)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)
    true = LineSTEDParams.create(sigma_exc=2.5, sigma_det=3.0,
                                 stripe_period=10.0, depletion=5.0,
                                 slit_halfwidth=3.0, brightness=100.0)
    data = line_sted_image(sample, true, geom).image  # noise-free calibration

    init = true.replace(sigma_det=jax.numpy.float32(2.0),
                        depletion=jax.numpy.float32(1.0))
    fitted, losses = fit_line_sted_params(
        data, sample, init, geom, fit_fields=("sigma_det", "depletion"),
        num_steps=400, learning_rate=5e-2)
    l = np.asarray(losses)
    assert l[-1] < 1e-2 * l[0]
    assert abs(float(fitted.sigma_det) - 3.0) < 0.1
    assert abs(float(fitted.depletion) - 5.0) < 0.3


def test_fit_is_jittable():
    shape = (32, 32)
    sample = samples.rings(shape, period=10.0)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)
    true = LineSTEDParams.create(depletion=3.0)
    data = line_sted_image(sample, true, geom).image

    fit = jax.jit(lambda d: fit_line_sted_params(
        d, sample, true.replace(depletion=jax.numpy.float32(1.0)), geom,
        fit_fields=("depletion",), num_steps=50)[0].depletion)
    out = float(fit(data))
    assert np.isfinite(out)
