"""Point-scanning STED engine (reference call stack 4.1; BASELINE config 1).

Two method paths, identical physics:

* ``"analytic"`` (default): one FFT correlation of the sample with the
  closed-form system kernel, then one Poisson draw -- statistically exact
  (see ``imaging/analytic.py``). This is the production path.
* ``"scan"``: the faithful per-scan-position process (the reference's
  ``W*H``-iteration Python hot loop). With per-step noise it is a
  ``lax.scan`` over chunks: batched gather-shift / emit-multiply /
  FFT-convolve / Poisson / pinhole-sum. With collapsed noise the
  pinhole-folded raster reduces exactly to one circular correlation with
  ``P = eff . (pinhole (*) det)`` -- identical math, no loop. Used for
  parity testing and per-step camera-frame inspection on small grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rescan_line_sted_tpu.config import PointSTEDGeometry, PointSTEDParams
from rescan_line_sted_tpu.imaging import analytic
from rescan_line_sted_tpu.imaging.shifts import shifted_images
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import models
from rescan_line_sted_tpu.physics import psf as psfs
from rescan_line_sted_tpu.physics.dose import DoseReport, point_sted_dose
from rescan_line_sted_tpu.physics.noise import maybe_poisson


@struct.dataclass
class AcquisitionResult:
    image: jnp.ndarray
    dose: DoseReport


def point_sted_image(
    sample: jnp.ndarray,
    params: PointSTEDParams,
    geom: PointSTEDGeometry,
    key: jax.Array | None = None,
    method: str = "analytic",
    noise_mode: str = "collapsed",
    boundary: str = "circular",
    margin: int | None = None,
) -> AcquisitionResult:
    """Simulate a full descanned point-STED acquisition of ``sample``.

    ``key=None`` returns the noise-free expected image. ``noise_mode`` (scan
    path): ``"collapsed"`` draws shot noise once from the detected mean --
    statistically identical to per-camera-pixel draws (pinhole sums of
    independent Poissons are Poisson; see ``physics/noise.py``);
    ``"per_step"`` samples every camera frame like the reference's loop.
    ``boundary``: ``"circular"`` (grid-periodic world) or ``"padded"``
    (open boundary via pad-acquire-crop, margin >= PSF support; dose is
    reported for the requested field).
    """
    if boundary == "apodized":
        # raised-cosine taper to zero at the edges: kills wrap artifacts
        # without the padded-acquisition cost (see imaging/boundary.py)
        from rescan_line_sted_tpu.imaging.boundary import (
            apodize_sample,
            default_margin,
        )

        sample = apodize_sample(
            sample, default_margin(geom) if margin is None else margin)
        boundary = "circular"
    if boundary == "padded":
        from rescan_line_sted_tpu.imaging.boundary import (
            acquire_padded,
            default_margin,
        )

        res = acquire_padded(
            lambda s, g, **kw: point_sted_image(s, params, g, **kw),
            sample, geom, default_margin(geom) if margin is None else margin,
            key=key, method=method, noise_mode=noise_mode)
        return res.replace(dose=point_sted_dose(params, geom))
    if boundary != "circular":
        raise ValueError(f"unknown boundary {boundary!r}")
    if method == "analytic":
        image = _analytic(sample, params, geom, key)
    elif method == "scan":
        image = _scan(sample, params, geom, key, noise_mode)
    else:
        raise ValueError(f"unknown method {method!r}")
    return AcquisitionResult(image=image, dose=point_sted_dose(params, geom))


def _analytic(sample, params, geom, key):
    k = analytic.point_system_kernel(geom.grid.shape, params)
    mean = params.brightness * fftconv.fft_correlate(sample, k)
    return maybe_poisson(key, mean)


def _scan(sample, params, geom, key, noise_mode="collapsed"):
    if noise_mode not in ("collapsed", "per_step"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    shape = geom.grid.shape
    h, w = shape
    chunk = geom.chunk
    num_steps = geom.num_steps
    if num_steps % chunk:
        raise ValueError("chunk must divide height * width")
    n_chunks = num_steps // chunk
    per_step = key is not None and noise_mode == "per_step"

    eff = models.effective_point_psf(shape, params)
    det = psfs.detection_psf(shape, params.sigma_det)
    pin = psfs.pinhole_mask(shape, params.pinhole_radius)

    if not per_step:
        # All W*H steps collapse: folding detection into the step
        # (Q = pin (*) det) makes each detected value an inner product with
        # a shifted copy of P = eff . Q, so the whole raster is ONE circular
        # correlation with P -- the same kernel the analytic path derives.
        p2d = eff * fftconv.fft_convolve(pin, det)
        img = params.brightness * fftconv.fft_correlate(sample, p2d)
        return img if key is None else maybe_poisson(key, img)

    # Per-step camera synthesis with separable detection: two 1D
    # convolutions instead of a 2D FFT pair (the 2D illumination must stay
    # inside the loop, but det = gy (x) gx always factorizes).
    otf_y = fftconv.profile_to_otf1d(psfs.detection_profile(h, params.sigma_det))
    otf_x = fftconv.profile_to_otf1d(psfs.detection_profile(w, params.sigma_det))
    # Raster scan: step s visits pixel (s // W, s % W).
    steps = jnp.arange(num_steps).reshape(n_chunks, chunk)
    xs = (steps, jax.random.split(key, n_chunks))

    # Point frames are bright only around the 2D illumination spot, i.e.
    # already row-localized in the natural layout -- the tiered-block
    # hardware-PRNG sampler skips the expensive tiers on the (majority)
    # dark rows with no transpose needed (docs/PERFORMANCE.md).
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from rescan_line_sted_tpu.kernels.poisson_pallas import (
            poisson_rows_tiered,
        )

    def body(img, chunk_in):
        pos_flat, k = chunk_in
        pos = jnp.stack([pos_flat // w, pos_flat % w], axis=-1)  # [C, 2] (y, x)
        ill = shifted_images(eff, pos)                           # [C, H, W]
        blurred = fftconv.convolve_otf1d(
            fftconv.convolve_otf1d(ill * sample, otf_x, axis=-1, n=w),
            otf_y, axis=-2, n=h)
        mean = params.brightness * blurred
        cam = poisson_rows_tiered(k, mean) if on_tpu \
            else maybe_poisson(k, mean)
        pinholes = shifted_images(pin, pos)                      # [C, H, W]
        vals = jnp.einsum("chw,chw->c", cam, pinholes)
        return img.at[pos[:, 0], pos[:, 1]].set(vals), None

    init = jnp.zeros(shape, jnp.float32)
    img, _ = jax.lax.scan(body, init, xs)
    return img
