"""Closed-form system kernels: each modality's noise-free image as ONE conv.

This module is the TPU-first heart of the engine. The reference simulates
every modality with a per-scan-position Python loop (SURVEY.md section 4); but
for linear descanned/rescanned detection the whole acquisition collapses
analytically to a **single circular FFT convolution** of the sample with a
modality-specific *system kernel*, and -- because sums of independent Poisson
variables are Poisson -- sampling shot noise once from that accumulated mean
is *statistically exact* (see ``physics/noise.py``). This turns the
reference's O(W^2 FFTs) point-STED scan into O(1) FFTs without changing the
physics.

Derivations (circular grid, centered kernels; ``corr(sample, K)(r) =
sum_a sample(a) K(a - r)``; see ``kernels/fftconv.py``):

* **Descanned point-STED** -- camera mean at scan position x0 is
  ``B * (sample . eff(.-x0)) (*) det``; the descanned pinhole sum is then
  ``img(x0) = B * corr(sample, K)`` with ``K = eff . (pinhole (*) det)``.
* **Descanned line-STED** -- the slit sum over camera row y collapses the
  same way with ``K(vy, vx) = e(vx) . flip(conv_x(det, slit))(vy, vx)``
  where ``e`` is the 1D effective line-excitation profile.
* **Rescanned line-STED** -- reassigning camera column x of scan position x0
  to canvas column ``u = R*x0 + (x - x0)`` gives
  ``canvas(y, u) = sum_a sample(., a) H(y-., u - R*a)``, i.e. the sample
  **upsampled by R along x** convolved with the rescan kernel
  ``H(vy, vx) = sum_t e(t) det(vy, vx + (R-1) t)``
  = ``corr_x(det, upsample_x(e, R-1))``. Requires integer R; differs from
  the per-step process only through circular wrap (the scan path wraps
  illumination mod the sample width W but frames mod the canvas width R*W).
  For samples that are zero within ~PSF support of their x-edges the two
  paths agree everywhere on the canvas -- pad the sample if edge wrap
  matters.

These kernels double as the per-view PSFs for Richardson-Lucy fusion and as
the resolution-metric input (FWHM of K), mirroring the reference's
``psf_report``-style calculators (component C8/C9).
"""

from __future__ import annotations

import jax.numpy as jnp

from rescan_line_sted_tpu.config import (
    LineSTEDParams,
    PointSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.imaging.shifts import flip_centered
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import psf as psfs


def point_system_kernel(
    shape: tuple[int, int], params: PointSTEDParams
) -> jnp.ndarray:
    """Centered system kernel K of descanned point-STED, [H, W].

    ``K = psf_eff . (pinhole (*) psf_det)``; the noise-free image is
    ``brightness * corr(sample, K)``.
    """
    exc = psfs.gaussian_psf(shape, params.sigma_exc)
    dep = psfs.donut_psf(shape, params.sigma_dep)
    eff = psfs.effective_psf(exc, dep, params.depletion)
    det = psfs.detection_psf(shape, params.sigma_det)
    pin = psfs.pinhole_mask(shape, params.pinhole_radius)
    return eff * fftconv.fft_convolve(pin, det)


def line_system_kernel(
    shape: tuple[int, int], params: LineSTEDParams
) -> jnp.ndarray:
    """Centered system kernel K of descanned line-STED, [H, W].

    ``K(vy, vx) = e_eff(vx) . flip(det (*)_x slit)(vy, vx)`` where the slit
    integrates camera columns and detection keeps row resolution.
    """
    h, w = shape
    exc = psfs.line_excitation_profile(w, params.sigma_exc)
    dep = psfs.stripe_depletion_profile(w, params.stripe_period)
    eff = psfs.effective_psf(exc, dep, params.depletion)
    det = psfs.detection_psf(shape, params.sigma_det)
    slit = psfs.slit_profile(w, params.slit_halfwidth)
    # 1D circular convolution of each det row with the centered slit.
    slit_k = jnp.fft.ifftshift(slit)
    d = jnp.fft.irfft(jnp.fft.rfft(det, axis=-1) * jnp.fft.rfft(slit_k), n=w, axis=-1)
    return eff[None, :] * flip_centered(d)


def rescan_system_kernel(
    geom: RescanGeometry, params: LineSTEDParams
) -> jnp.ndarray:
    """Centered rescan kernel H on the canvas grid, [H, Wc].

    ``H(vy, vx) = sum_t e_eff(t) det(vy, vx + (R-1) t)``: the detection PSF
    sheared by the (R-1)-stretched effective excitation line. The noise-free
    canvas is ``brightness * conv(upsample_x(sample, R), H)``. Requires
    integer ``rescan_factor`` and ``binning == 1``.
    """
    r = geom.rescan_factor
    if geom.binning != 1 or abs(r - round(r)) > 1e-9:
        raise NotImplementedError(
            "analytic rescan kernel requires integer R and binning=1; "
            "use the scan engine for general geometry")
    r = int(round(r))
    h, w = geom.grid.shape
    hc, wc = geom.canvas_shape
    exc = psfs.line_excitation_profile(w, params.sigma_exc)
    dep = psfs.stripe_depletion_profile(w, params.stripe_period)
    eff = psfs.effective_psf(exc, dep, params.depletion)
    det = psfs.detection_psf((hc, wc), params.sigma_det)
    # upsample_x(e, R-1) on the canvas width: e(t) placed at x = (R-1) * t.
    e_up = jnp.zeros((wc,), det.dtype)
    t = jnp.arange(w) - w // 2
    e_up = e_up.at[((r - 1) * t + wc // 2) % wc].add(eff)
    # H = corr_x(det, e_up): H(vx) = sum_t e_up(t') det(vx + t') with t' centered.
    e_k = jnp.fft.ifftshift(e_up)
    return jnp.fft.irfft(
        jnp.fft.rfft(det, axis=-1) * jnp.conj(jnp.fft.rfft(e_k)), n=wc, axis=-1
    )


def upsample_x(sample: jnp.ndarray, factor: int, out_width: int) -> jnp.ndarray:
    """Zero-insertion upsampling along x: pixel a -> column factor * a."""
    h, w = sample.shape[-2:]
    out = jnp.zeros(sample.shape[:-1] + (out_width,), sample.dtype)
    return out.at[..., jnp.arange(w) * factor].set(sample)
