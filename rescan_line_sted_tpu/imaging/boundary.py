"""Padded (non-circular) acquisition boundaries.

All convolutions are circular on the simulation grid (documented in
``kernels/fftconv.py``); content near the field edges therefore wraps. For
samples where that matters, acquire on a zero-padded grid and crop: with a
margin of at least the PSF/illumination support, wrap contributions vanish
and the result equals an open-boundary acquisition.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.config import Grid


def default_margin(geom) -> int:
    """A reasonable pad margin for ``boundary="padded"`` acquisitions.

    ~1/8 of the field (>= 8 px), rounded up until it satisfies the binned
    rescan crop alignment (``margin % b == 0`` and
    ``round(R * margin) % b == 0``). Callers with very wide PSFs should pass
    an explicit margin >= the PSF support instead.
    """
    h, w = geom.grid.shape
    b = getattr(geom, "binning", 1)
    r = getattr(geom, "rescan_factor", None)
    base = ((max(8, min(h, w) // 8) + b - 1) // b) * b
    if r is None:
        return base
    # prefer a margin that makes R*margin integral, so the rescan canvas
    # crop needs no band-limited sub-pixel shift (acquire_padded applies
    # one exactly when it does not -- irrational R included)
    for m in range(base, base + 64):
        if m % b == 0 and round(r * m) % b == 0 \
                and abs(r * m - round(r * m)) < 1e-6:
            return m
    return base


def pad_sample(sample: jnp.ndarray, margin: int) -> jnp.ndarray:
    """Zero-pad a sample by ``margin`` pixels on every side."""
    return jnp.pad(sample, ((margin, margin), (margin, margin)))


def apodize_sample(sample: jnp.ndarray, margin: int) -> jnp.ndarray:
    """Taper a sample to zero over ``margin`` pixels at every edge
    (separable raised-cosine / Tukey window).

    A cheap alternative to padded acquisition: the tapered field has no
    content at the wrap seam, so circular-convolution artifacts vanish, at
    the cost of attenuating (not faithfully imaging) the outer ``margin``
    pixels. Use ``boundary="padded"`` when the edges themselves matter.
    """
    if margin < 0:
        raise ValueError(f"margin must be >= 0, got {margin}")
    if margin == 0:
        return sample  # no taper requested

    def window(n: int) -> jnp.ndarray:
        x = jnp.arange(n, dtype=jnp.float32)
        ramp_in = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.clip(x / margin, 0, 1))
        ramp_out = 0.5 - 0.5 * jnp.cos(
            jnp.pi * jnp.clip((n - 1 - x) / margin, 0, 1))
        return ramp_in * ramp_out

    h, w = sample.shape[-2:]
    return sample * window(h)[:, None] * window(w)[None, :]


def padded_geometry(geom, margin: int):
    """The same geometry on the padded grid (chunk adjusted to divide)."""
    h = geom.grid.height + 2 * margin
    w = geom.grid.width + 2 * margin
    # pick the largest chunk <= original that divides the padded step count
    steps = h * w if type(geom).__name__ == "PointSTEDGeometry" else w
    chunk = geom.chunk
    while steps % chunk:
        chunk -= 1
    return dataclasses.replace(geom, grid=Grid(h, w), chunk=chunk)


def acquire_padded(engine_fn, sample: jnp.ndarray, geom, margin: int,
                   **kwargs):
    """Run ``engine_fn(padded_sample, geom_padded, **kwargs)`` and crop.

    ``engine_fn(sample, geom, **kwargs) -> AcquisitionResult``; the returned
    result's image is cropped back to the original field (for rescan
    canvases the x-crop scales by the rescan factor).
    """
    padded = pad_sample(sample, margin)
    pgeom = padded_geometry(geom, margin)
    res = engine_fn(padded, pgeom, **kwargs)
    img = res.image
    h, w = sample.shape[-2:]
    if hasattr(geom, "rescan_factor"):
        r = geom.rescan_factor
        b = geom.binning
        if margin % b:
            raise ValueError(
                f"margin={margin} must be divisible by binning={b}, or the "
                "binned row crop shifts off the original field")
        def crop_scaled(img, axis, n_out):
            """Crop a rescanned axis at canvas coordinate R*margin/b.

            Irrational (or just non-integral) R*margin: the original
            field's canvas edge falls between binned canvas pixels; shift
            the padded canvas by the fractional offset band-limitedly (an
            rfft phase ramp -- the same subpixel machinery the rescan
            engine places frames with) so the static crop lands exactly.
            Geometry fields are static Python scalars, so the crop index is
            host math (jnp here would trace under jit and break the slice).
            """
            x0f = float(r) * margin / b
            x0 = math.floor(x0f + 1e-9)
            frac = x0f - x0
            if frac > 1e-9:
                import numpy as np
                n = img.shape[axis]
                kk = np.arange(n // 2 + 1, dtype=np.float64)
                ph = np.exp(2j * np.pi * kk * frac / n)
                shp = [1, 1]
                shp[axis] = n // 2 + 1
                ph_j = jax.lax.complex(
                    jnp.asarray(ph.real.astype(np.float32)).reshape(shp),
                    jnp.asarray(ph.imag.astype(np.float32)).reshape(shp))
                img = jnp.fft.irfft(jnp.fft.rfft(img, axis=axis) * ph_j,
                                    n=n, axis=axis)
            return jax.lax.slice_in_dim(img, x0, x0 + n_out, axis=axis)

        # x is always rescanned; y too under 2D (point) pixel reassignment
        from rescan_line_sted_tpu.config import RescanPointGeometry

        img = crop_scaled(img, 1, int(round(r * w)) // b)
        if isinstance(geom, RescanPointGeometry):
            img = crop_scaled(img, 0, int(round(r * h)) // b)
        else:
            img = img[margin // b: margin // b + h // b]
    else:
        img = img[margin: margin + h, margin: margin + w]
    return res.replace(image=img)
