"""Descanned line-STED engine (reference call stack 4.2; BASELINE config 2).

The excitation line runs along y and is scanned along x: ``W`` scan positions
produce one image column each through a descanned slit. Methods as in
``point_sted.py``: ``"analytic"`` (one FFT correlation with the closed-form
system kernel, exact statistics) and ``"scan"`` (the per-scan-position
process; this is the scan-steps/sec benchmark path). Scan scheduling:

* collapsed noise (default): detection folds into the step (``q = slit (*)
  gx``) and every step is an inner product with a shifted copy of
  ``p = eff . q`` -- the whole raster is ONE MXU matmul against
  ``circulant(p)``.
* per-step noise: chunked ``lax.scan``; each chunk's camera frames come from
  a circulant MXU matmul, get Poisson-sampled, then slit-summed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.config import LineSTEDGeometry, LineSTEDParams
from rescan_line_sted_tpu.imaging import analytic
from rescan_line_sted_tpu.imaging.point_sted import AcquisitionResult
from rescan_line_sted_tpu.imaging.shifts import shifted_profiles
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import psf as psfs
from rescan_line_sted_tpu.physics.dose import line_sted_dose
from rescan_line_sted_tpu.physics.noise import maybe_poisson


def line_sted_image(
    sample: jnp.ndarray,
    params: LineSTEDParams,
    geom: LineSTEDGeometry,
    key: jax.Array | None = None,
    method: str = "analytic",
    noise_mode: str = "collapsed",
) -> AcquisitionResult:
    """Simulate a full descanned line-STED acquisition of ``sample``.

    ``noise_mode`` (scan path only): ``"collapsed"`` draws shot noise once
    from the accumulated detected mean -- statistically identical to
    per-camera-pixel draws because detection only *adds* independent Poisson
    variables (see ``physics/noise.py``) and ~4x faster; ``"per_step"``
    samples every camera frame like the reference's loop does.
    """
    if method == "analytic":
        image = _analytic(sample, params, geom, key)
    elif method == "scan":
        image = _scan(sample, params, geom, key, noise_mode)
    else:
        raise ValueError(f"unknown method {method!r}")
    return AcquisitionResult(image=image, dose=line_sted_dose(params, geom))


def effective_line_profile(width: int, params: LineSTEDParams) -> jnp.ndarray:
    """Centered 1D effective (depleted) excitation line profile, [W]."""
    exc = psfs.line_excitation_profile(width, params.sigma_exc)
    dep = psfs.stripe_depletion_profile(width, params.stripe_period)
    return psfs.effective_psf(exc, dep, params.depletion)


def _analytic(sample, params, geom, key):
    k = analytic.line_system_kernel(geom.grid.shape, params)
    mean = params.brightness * fftconv.fft_correlate(sample, k)
    return maybe_poisson(key, mean)


def _scan(sample, params, geom, key, noise_mode="collapsed"):
    if noise_mode not in ("collapsed", "per_step"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    shape = geom.grid.shape
    h, w = shape
    chunk = geom.chunk
    if w % chunk:
        raise ValueError("chunk must divide width")
    n_chunks = w // chunk
    per_step = key is not None and noise_mode == "per_step"

    eff = effective_line_profile(w, params)
    slit = psfs.slit_profile(w, params.slit_halfwidth)

    # Separable detection: det = gy (x) gx exactly, and the line illumination
    # is y-invariant, so convy hoists out of the loop:
    # conv2d(det, sample . ill) == convx(gx, ill . convy(gy, sample)).
    gx = psfs.detection_profile(w, params.sigma_det)
    otf_y = fftconv.profile_to_otf1d(psfs.detection_profile(h, params.sigma_det))
    sample_y = fftconv.convolve_otf1d(sample, otf_y, axis=-2, n=h)
    if not per_step:
        # All W scan steps collapse to ONE MXU matmul: folding detection into
        # the step (q = slit (*) gx) gives img(y, x0) = sum_a sample_y(y, a)
        # * p(a - x0) with p = eff . q, i.e. sample_y @ circulant(p). Same
        # per-step physics, scheduled as a single 512^3-class matmul.
        q = fftconv.convolve_profiles(slit, gx)
        p_mat = fftconv.circulant_matrix(params.brightness * eff * q)
        img = jnp.dot(sample_y, p_mat,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return img if key is None else maybe_poisson(key, img)

    # Per-step noise: explicit camera frames, chunked lax.scan; the circular
    # x-convolution is one MXU matmul per chunk with the circulant of gx.
    gx_mat = fftconv.circulant_matrix(gx)
    positions = jnp.arange(w).reshape(n_chunks, chunk)
    xs = (positions, jax.random.split(key, n_chunks))

    def body(img, chunk_in):
        pos, k = chunk_in
        ill = shifted_profiles(eff, pos)                         # [C, W]
        emitted_y = ill[:, None, :] * sample_y[None]             # [C, H, W]
        cam = maybe_poisson(
            k, params.brightness
            * jnp.einsum("cha,ax->chx", emitted_y, gx_mat,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST))
        slits = shifted_profiles(slit, pos)                      # [C, W]
        cols = jnp.einsum("chw,cw->hc", cam, slits)              # [H, C]
        return img.at[:, pos].set(cols), None

    init = jnp.zeros(shape, jnp.float32)
    img, _ = jax.lax.scan(body, init, xs)
    return img
