"""Gradient-based MAP deconvolution (optax + autodiff).

A modern alternative to Richardson-Lucy for the multi-view fusion problem:
maximize the Poisson log-likelihood of the acquired views under the linear
forward model, with optional total-variation regularization, by gradient
descent on a softplus-parameterized estimate. Differentiating *through* the
acquisition forward model is something the reference's numpy loops cannot do
at all -- it falls out of the JAX formulation for free, and the update step
is a jitted ``lax.scan`` over optimizer steps (the framework's "training
step"; ``jax.checkpoint`` on the per-view model keeps memory flat when V is
large).

Loss:  sum_v sum_pixels [ A_v(est) - data_v * log A_v(est) ]
       + tv_weight * TV(est)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from rescan_line_sted_tpu.kernels import fftconv


def _total_variation(img: jnp.ndarray) -> jnp.ndarray:
    dy = jnp.diff(img, axis=-2)
    dx = jnp.diff(img, axis=-1)
    return jnp.sum(jnp.sqrt(dy[..., :, :-1] ** 2 + dx[..., :-1, :] ** 2
                            + 1e-12))


def map_deconvolve_views(
    data: jnp.ndarray,
    psfs: jnp.ndarray,
    num_steps: int = 200,
    learning_rate: float = 5e-2,
    tv_weight: float = 0.0,
    eps: float = 1e-6,
    init: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MAP fusion of views [V, H, W] with centered per-view PSFs [V, H, W].

    Returns ``(estimate [H, W], losses [num_steps])``. Positivity via
    softplus parameterization; Adam optimizer; one jitted scan over steps.
    """
    otfs = fftconv.kernel_to_otf(psfs)
    shape = data.shape[-2:]
    scale = jnp.maximum(jnp.mean(data), eps)

    def unconstrained(theta):
        return scale * jax.nn.softplus(theta)

    @jax.checkpoint
    def forward(est):
        return fftconv.convolve_otf(est[None], otfs, shape)  # [V, H, W]

    def loss_fn(theta):
        est = unconstrained(theta)
        pred = jnp.maximum(forward(est), eps * scale)
        nll = jnp.sum(pred - data * jnp.log(pred))
        if tv_weight:
            nll = nll + tv_weight * _total_variation(est)
        return nll

    if init is None:
        theta0 = jnp.zeros(shape, data.dtype)
    else:
        theta0 = jnp.log(jnp.expm1(jnp.maximum(init / scale, 1e-6)))
    opt = optax.adam(learning_rate)

    def step(carry, _):
        theta, opt_state = carry
        loss, grad = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = opt.update(grad, opt_state)
        return (optax.apply_updates(theta, updates), opt_state), loss

    (theta, _), losses = jax.lax.scan(
        step, (theta0, opt.init(theta0)), None, length=num_steps)
    return unconstrained(theta), losses
