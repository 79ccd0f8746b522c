"""Instrument calibration by autodiff through the acquisition model.

Because every engine is a pure JAX function of its (traced) physics
parameters, the acquisition forward model is differentiable end-to-end --
PSF widths, depletion saturation, and brightness can be *fitted* to measured
data by gradient descent. The reference's numpy loops cannot do this at all;
here it is ~40 lines: a Gaussian-likelihood (or Poisson) loss on the
noise-free engine output, optax Adam on a softplus parameterization, one
jitted ``lax.scan`` over steps.

Typical use: acquire a line-STED image of a known calibration sample (e.g.
sparse beads), then recover the instrument's effective sigma_det /
depletion from the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from rescan_line_sted_tpu.config import (
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
)
from rescan_line_sted_tpu.imaging.line_sted import line_sted_image
from rescan_line_sted_tpu.imaging.point_sted import point_sted_image


def fit_acquisition_params(
    forward,
    data: jnp.ndarray,
    init_params,
    fit_fields: tuple[str, ...],
    num_steps: int = 300,
    learning_rate: float = 5e-2,
):
    """Fit selected physics parameters of ANY acquisition forward model.

    ``forward(params) -> predicted image`` must be a pure JAX function of
    the params pytree (every engine in ``imaging/`` qualifies, including
    the analytic rescan/ISM canvas means). Fitted fields are kept positive
    via softplus; the rest stay at ``init_params``. Returns
    ``(fitted_params, losses [num_steps])``.
    """
    init_vals = {f: jnp.asarray(getattr(init_params, f), jnp.float32)
                 for f in fit_fields}
    # softplus^{-1} so optimization is unconstrained
    theta0 = {f: jnp.log(jnp.expm1(jnp.maximum(v, 1e-4)))
              for f, v in init_vals.items()}

    def to_params(theta):
        return init_params.replace(
            **{f: jax.nn.softplus(t) for f, t in theta.items()})

    def loss_fn(theta):
        pred = forward(to_params(theta))
        return jnp.mean(jnp.square(pred - data))

    opt = optax.adam(learning_rate)

    def step(carry, _):
        theta, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = opt.update(grad, opt_state)
        return (optax.apply_updates(theta, updates), opt_state), loss

    (theta, _), losses = jax.lax.scan(
        step, (theta0, opt.init(theta0)), None, length=num_steps)
    return to_params(theta), losses


def fit_line_sted_params(
    data: jnp.ndarray,
    sample: jnp.ndarray,
    init_params: LineSTEDParams,
    geom: LineSTEDGeometry,
    fit_fields: tuple[str, ...] = ("sigma_det", "depletion"),
    num_steps: int = 300,
    learning_rate: float = 5e-2,
) -> tuple[LineSTEDParams, jnp.ndarray]:
    """Fit line-STED physics to a measured descanned image of ``sample``."""
    return fit_acquisition_params(
        lambda p: line_sted_image(sample, p, geom).image, data, init_params,
        fit_fields, num_steps, learning_rate)


def fit_point_sted_params(
    data: jnp.ndarray,
    sample: jnp.ndarray,
    init_params: PointSTEDParams,
    geom: PointSTEDGeometry,
    fit_fields: tuple[str, ...] = ("sigma_det", "depletion"),
    num_steps: int = 300,
    learning_rate: float = 5e-2,
) -> tuple[PointSTEDParams, jnp.ndarray]:
    """Fit point-STED physics to a measured descanned image of ``sample``."""
    return fit_acquisition_params(
        lambda p: point_sted_image(sample, p, geom).image, data, init_params,
        fit_fields, num_steps, learning_rate)
