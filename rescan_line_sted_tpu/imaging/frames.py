"""Per-scan-position camera frame synthesis (figure/animation support).

The reference's figures animate the raw camera image at individual scan
positions (illuminate -> emit -> blur -> shot noise, before any detection
integration). These helpers return exactly those frames for a chosen set of
positions -- the same math as the scan engines' per-step bodies, vmapped, so
panels/animations don't have to run a full acquisition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.config import (
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
)
from rescan_line_sted_tpu.imaging.line_sted import effective_line_profile
from rescan_line_sted_tpu.imaging.shifts import shifted_images, shifted_profiles
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import models
from rescan_line_sted_tpu.physics import psf as psfs
from rescan_line_sted_tpu.physics.noise import maybe_poisson


def line_sted_camera_frames(
    sample: jnp.ndarray,
    params: LineSTEDParams,
    geom: LineSTEDGeometry,
    positions: jnp.ndarray,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Camera frames [C, H, W] at the given column scan positions."""
    h, w = geom.grid.shape
    eff = effective_line_profile(w, params)
    otf_y = fftconv.profile_to_otf1d(psfs.detection_profile(h, params.sigma_det))
    otf_x = fftconv.profile_to_otf1d(psfs.detection_profile(w, params.sigma_det))
    sample_y = fftconv.convolve_otf1d(sample, otf_y, axis=-2, n=h)
    ill = shifted_profiles(eff, jnp.asarray(positions))
    mean = params.brightness * fftconv.convolve_otf1d(
        ill[:, None, :] * sample_y[None], otf_x, axis=-1, n=w)
    return maybe_poisson(key, mean)


def point_sted_camera_frames(
    sample: jnp.ndarray,
    params: PointSTEDParams,
    geom: PointSTEDGeometry,
    positions_yx: jnp.ndarray,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Camera frames [C, H, W] at the given (y, x) scan positions."""
    shape = geom.grid.shape
    eff = models.effective_point_psf(shape, params)
    det_otf = fftconv.kernel_to_otf(psfs.detection_psf(shape, params.sigma_det))
    ill = shifted_images(eff, jnp.asarray(positions_yx))
    mean = params.brightness * fftconv.convolve_otf(ill * sample, det_otf)
    return maybe_poisson(key, mean)
