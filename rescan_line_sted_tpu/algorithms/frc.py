"""Fourier Ring Correlation: data-driven resolution measurement.

The kernel-FWHM metrics (``algorithms/metrics.py``) measure the *system's*
resolution from its closed-form PSF. FRC measures the *achieved* resolution
from two independent noisy acquisitions of the same field -- the standard
practice for real microscopy data (Nieuwenhuizen et al., Nat. Methods 10,
557 (2013)) and the natural companion for this engine's independent-draw
noise model. Beyond the reference's capability surface.

TPU-shaped: one batched rFFT2 pair, ring binning as a one-hot matmul
(segment sums lower poorly on TPU; a [rings, H*(W//2+1)] f32 matmul is one
MXU pass), fully jittable and vmappable -- FRC curves can ride inside
vmapped sweeps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _ring_matrix(shape: tuple[int, int],
                 num_rings: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-hot ring-membership matrix [R, H * (W//2+1)] and the rings'
    mean frequencies [R] (static; DC and empty rings dropped)."""
    h, w = shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    r = np.sqrt(fy * fy + fx * fx)  # cycles/pixel, 0 .. ~0.5 on the axes
    idx = np.minimum((r / 0.5 * num_rings).astype(np.int64), num_rings - 1)
    rings = np.zeros((num_rings, r.size), np.float32)
    rings[idx.ravel(), np.arange(r.size)] = 1.0
    counts = rings.sum(axis=1)
    freqs = rings @ r.ravel() / np.maximum(counts, 1.0)
    keep = counts > 0
    keep[0] = False  # DC ring: 0/0 after mean subtraction
    return jnp.asarray(rings[keep]), jnp.asarray(freqs[keep].astype(
        np.float32))


def frc_curve(img1: jnp.ndarray, img2: jnp.ndarray,
              num_rings: int = 64) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FRC(k) between two independent acquisitions of the same field.

    Returns ``(freqs, frc)``: ring-center spatial frequencies in
    cycles/pixel (0 .. 0.5) and the correlation per ring,

        FRC(k) = Re sum_ring F1 conj(F2) /
                 sqrt(sum_ring |F1|^2 . sum_ring |F2|^2).
    """
    h, w = img1.shape[-2:]
    rings, freqs = _ring_matrix((h, w), num_rings)
    f1 = jnp.fft.rfft2(img1 - jnp.mean(img1))
    f2 = jnp.fft.rfft2(img2 - jnp.mean(img2))
    cross = jnp.real(f1 * jnp.conj(f2)).reshape(-1)
    p1 = jnp.abs(f1).reshape(-1) ** 2
    p2 = jnp.abs(f2).reshape(-1) ** 2
    num = rings @ cross
    den = jnp.sqrt((rings @ p1) * (rings @ p2))
    return freqs, num / jnp.maximum(den, 1e-30)


def _sector_ring_matrix(shape: tuple[int, int], num_rings: int, axis: str,
                        half_angle_deg: float
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ring matrix restricted to an angular sector around one frequency axis.

    ``axis='x'`` keeps bins whose frequency vector lies within
    ``half_angle_deg`` of the kx axis (resolution along image x), ``'y'``
    likewise for ky. Same one-hot-matmul layout as :func:`_ring_matrix`;
    rings that end up empty inside the sector are dropped (their mean
    frequency comes only from surviving bins, so the crossing interpolation
    stays well-defined).
    """
    h, w = shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    r = np.sqrt(fy * fy + fx * fx)
    # angle from the kx axis in [0, 90] deg (rfft half-plane; |fy| folds
    # the hermitian symmetry, which FRC already assumes)
    ang = np.degrees(np.arctan2(np.abs(fy), np.abs(fx)) * np.ones_like(r))
    in_sector = (ang <= half_angle_deg if axis == "x"
                 else ang >= 90.0 - half_angle_deg)
    idx = np.minimum((r / 0.5 * num_rings).astype(np.int64), num_rings - 1)
    rings = np.zeros((num_rings, r.size), np.float32)
    flat = np.arange(r.size)[in_sector.ravel()]
    rings[idx.ravel()[in_sector.ravel()], flat] = 1.0
    counts = rings.sum(axis=1)
    freqs = rings @ r.ravel() / np.maximum(counts, 1.0)
    keep = counts > 0
    keep[0] = False
    return jnp.asarray(rings[keep]), jnp.asarray(freqs[keep].astype(
        np.float32))


def _resolution_from_curve(freqs: jnp.ndarray, frc: jnp.ndarray,
                           threshold: float) -> jnp.ndarray:
    """First-crossing 1/7-criterion resolution shared by the radial and
    sectored variants (see :func:`frc_resolution` for the conventions)."""
    below = frc < threshold
    crossing = (~below[:-1]) & below[1:]
    idx = jnp.argmax(crossing)  # 0 if none: guarded below
    any_crossing = jnp.any(crossing)
    f0, f1_ = freqs[idx], freqs[idx + 1]
    y0, y1 = frc[idx], frc[idx + 1]
    t = (y0 - threshold) / jnp.maximum(y0 - y1, 1e-30)
    k_c = f0 + t * (f1_ - f0)
    res = 1.0 / jnp.maximum(k_c, 1e-30)
    res = jnp.where(any_crossing, res, jnp.nan)
    return jnp.where(below[0], 2.0, res)


def frc_sectored_resolution(img1: jnp.ndarray, img2: jnp.ndarray,
                            num_rings: int = 48,
                            half_angle_deg: float = 30.0,
                            threshold: float = 1.0 / 7.0
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis achieved resolution ``(res_x, res_y)`` in pixels.

    Radial FRC assumes isotropic frequency content; on an anisotropically
    scaled canvas (the unfused rescan canvas: x magnified by R/b, y shrunk
    by b) a ring mixes two different physical frequencies. Sectored FRC
    (Nieuwenhuizen et al. 2013 supplement; "FRC along an axis") restricts
    each ring to a ``half_angle_deg`` wedge around one frequency axis, so
    the crossing measures resolution along that image axis and can be
    rescaled to sample units with that axis's scale factor alone.

    Same TPU shape as :func:`frc_curve`: the two sector matrices are
    static one-hot matmuls; jittable/vmappable.
    """
    h, w = img1.shape[-2:]
    f1 = jnp.fft.rfft2(img1 - jnp.mean(img1))
    f2 = jnp.fft.rfft2(img2 - jnp.mean(img2))
    cross = jnp.real(f1 * jnp.conj(f2)).reshape(-1)
    p1 = jnp.abs(f1).reshape(-1) ** 2
    p2 = jnp.abs(f2).reshape(-1) ** 2
    out = []
    for axis in ("x", "y"):
        rings, freqs = _sector_ring_matrix((h, w), num_rings, axis,
                                           half_angle_deg)
        num = rings @ cross
        den = jnp.sqrt((rings @ p1) * (rings @ p2))
        out.append(_resolution_from_curve(freqs, num / jnp.maximum(
            den, 1e-30), threshold))
    return out[0], out[1]


def frc_resolution(img1: jnp.ndarray, img2: jnp.ndarray,
                   num_rings: int = 64,
                   threshold: float = 1.0 / 7.0) -> jnp.ndarray:
    """Resolution (in pixels) from the FRC 1/7 criterion.

    The resolution is ``1 / k_c`` where ``k_c`` is the first ring frequency
    at which the FRC drops below ``threshold`` (linearly interpolated).
    Jittable; returns NaN if the curve never crosses (resolution beyond
    Nyquist -- images essentially identical) and ``2.0`` px (Nyquist) if it
    starts below threshold (no correlated signal).
    """
    freqs, frc = frc_curve(img1, img2, num_rings)
    return _resolution_from_curve(freqs, frc, threshold)
