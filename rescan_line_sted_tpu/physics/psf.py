"""PSF synthesis and the saturable-depletion nonlinearity.

Capability parity: reference components C1 (PSF synthesis) and C2 (saturable
depletion) from SURVEY.md section 3 (reference location: inline array
constructions in ``figure_generation/figure_*.py`` -- unverifiable, mount
empty; see SURVEY.md section 0).

Conventions (shared with the numpy oracle in ``tests/oracle``):

* Arrays are ``[height, width]`` = ``[y, x]``; the grid center is
  ``(H // 2, W // 2)`` so ``jnp.fft.ifftshift`` moves the PSF peak to [0, 0].
* Illumination PSFs (excitation, depletion) are **peak-normalized** intensity
  patterns -- the ``brightness`` / ``depletion`` knobs carry the physical
  scale. The detection PSF is **sum-normalized** (a detection probability).
* All distances are in simulation pixels (the reference works in PSF-width
  units, not nm).

Physics (SURVEY.md section 1.1):

* excitation: diffraction-limited Gaussian ``exp(-r^2 / 2 sigma^2)`` (point)
  or a 1D Gaussian line profile (line-STED).
* depletion: donut ``u * exp(1 - u)`` with ``u = r^2 / (2 sigma^2)`` (zero at
  center, peak 1 on the ring ``r = sigma * sqrt(2)``), or a standing-wave
  stripe ``sin^2(pi x / period)`` (zero along the scanned line).
* saturable depletion: surviving emission fraction ``exp(-s * dep)``, i.e.
  the ``1 - exp(-I/I_sat)`` depletion probability; the effective illumination
  PSF is ``psf_eff = exc * exp(-s * dep)``. Resolution improves ~ sqrt(1+s).
"""

from __future__ import annotations

import jax.numpy as jnp


def _centered_coords(n: int) -> jnp.ndarray:
    """Signed pixel offsets from the grid center ``n // 2``."""
    return jnp.arange(n, dtype=jnp.float32) - (n // 2)


def radius_sq(shape: tuple[int, int]) -> jnp.ndarray:
    """Squared distance from the grid center, [H, W]."""
    y = _centered_coords(shape[0])[:, None]
    x = _centered_coords(shape[1])[None, :]
    return y * y + x * x


def gaussian_psf(shape: tuple[int, int], sigma) -> jnp.ndarray:
    """Peak-normalized 2D Gaussian intensity PSF, centered."""
    return jnp.exp(-radius_sq(shape) / (2.0 * jnp.square(sigma)))


def donut_psf(shape: tuple[int, int], sigma) -> jnp.ndarray:
    """Peak-normalized depletion donut (LG01-like): ``u e^{1-u}``.

    Exactly zero at the center, maximum 1 on the ring ``r = sigma*sqrt(2)``.
    """
    u = radius_sq(shape) / (2.0 * jnp.square(sigma))
    return u * jnp.exp(1.0 - u)


def line_excitation_profile(width: int, sigma) -> jnp.ndarray:
    """Peak-normalized 1D Gaussian excitation line profile along x, [W].

    The 2D illumination is this profile broadcast over y (uniform along the
    line).
    """
    x = _centered_coords(width)
    return jnp.exp(-jnp.square(x) / (2.0 * jnp.square(sigma)))


def stripe_depletion_profile(width: int, period) -> jnp.ndarray:
    """Peak-normalized standing-wave depletion stripe profile along x, [W].

    ``sin^2(pi x / period)``: zero at the excitation line (x = 0), first
    intensity maximum at ``x = period / 2``.
    """
    x = _centered_coords(width)
    return jnp.square(jnp.sin(jnp.pi * x / period))


def detection_psf(shape: tuple[int, int], sigma) -> jnp.ndarray:
    """Sum-normalized Gaussian detection PSF, centered."""
    g = gaussian_psf(shape, sigma)
    return g / jnp.sum(g)


def detection_profile(n: int, sigma) -> jnp.ndarray:
    """Sum-normalized 1D Gaussian detection profile, centered, [n].

    The 2D detection PSF factorizes exactly:
    ``detection_psf((H, W), s) == outer(detection_profile(H, s),
    detection_profile(W, s))`` -- the scan engines exploit this to hoist the
    y-convolution out of the scan loop (illumination is y-invariant).
    """
    x = _centered_coords(n)
    g = jnp.exp(-jnp.square(x) / (2.0 * jnp.square(sigma)))
    return g / jnp.sum(g)


def effective_psf(exc: jnp.ndarray, dep: jnp.ndarray, s) -> jnp.ndarray:
    """Saturable-depletion effective illumination: ``exc * exp(-s * dep)``.

    ``s`` is the peak depletion intensity in units of the saturation
    intensity; the depleted fraction is ``1 - exp(-s * dep)``.
    """
    return exc * jnp.exp(-s * dep)


def pinhole_mask(shape: tuple[int, int], radius) -> jnp.ndarray:
    """Centered descanned-pinhole integration mask (1 inside, 0 outside)."""
    return (radius_sq(shape) <= jnp.square(radius)).astype(jnp.float32)


def slit_profile(width: int, halfwidth) -> jnp.ndarray:
    """Centered descanned-slit integration profile along x, [W]."""
    x = _centered_coords(width)
    return (jnp.abs(x) <= halfwidth).astype(jnp.float32)
