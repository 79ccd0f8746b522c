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


def test_recovers_point_params_and_generic_ism_forward():
    """fit_point_sted_params recovers perturbed physics; the generic
    fit_acquisition_params drives the ISM closed form the same way."""
    import jax.numpy as jnp

    from rescan_line_sted_tpu.algorithms import (
        fit_acquisition_params,
        fit_point_sted_params,
    )
    from rescan_line_sted_tpu.config import (
        Grid,
        PointSTEDGeometry,
        PointSTEDParams,
        RescanPointGeometry,
    )
    from rescan_line_sted_tpu.data import samples
    from rescan_line_sted_tpu.imaging import (
        point_sted_image,
        rescan_point_canvas_mean,
    )

    n = 32
    sample = samples.siemens_star((n, n), spokes=6)
    geom = PointSTEDGeometry(Grid(n, n), chunk=32)
    true = PointSTEDParams.create(sigma_exc=2.0, sigma_det=2.2,
                                  sigma_dep=2.0, depletion=3.0,
                                  pinhole_radius=3.0, brightness=1.0)
    data = point_sted_image(sample, true, geom).image
    init = true.replace(sigma_det=jnp.float32(3.2),
                        depletion=jnp.float32(1.0))
    fit, losses = fit_point_sted_params(data, sample, init, geom,
                                        num_steps=500, learning_rate=1e-1)
    assert losses[-1] < losses[0] * 1e-2
    assert abs(float(fit.sigma_det) - 2.2) < 0.1
    assert abs(float(fit.depletion) - 3.0) < 0.3

    igeom = RescanPointGeometry(Grid(n, n), rescan_factor=2.0)
    idata = rescan_point_canvas_mean(sample, true, igeom)
    ifit, ilosses = fit_acquisition_params(
        lambda p: rescan_point_canvas_mean(sample, p, igeom), idata, init,
        ("sigma_det", "depletion"), num_steps=500, learning_rate=1e-1)
    assert ilosses[-1] < ilosses[0] * 1e-2
    assert abs(float(ifit.sigma_det) - 2.2) < 0.1
