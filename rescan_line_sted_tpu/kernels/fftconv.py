"""Fused circular FFT convolution (reference component C3, SURVEY.md section 3).

The reference convolves with ``scipy.signal.fftconvolve`` / ``np.fft`` per
scan step; here the detection OTF is computed **once** and reused across every
scan step and sweep point, so each step costs one rFFT2 + spectral multiply +
irFFT2, batched over chunked scan positions and fully fused by XLA
(BASELINE.json north_star: "fused FFT convolutions").

Conventions:

* Convolutions are **circular** on the simulation grid (the grid is the
  periodic world; samples should be padded by the caller if edge wrap
  matters). The numpy oracle uses the identical convention.
* Kernels are supplied *centered* (peak at ``(H//2, W//2)``);
  ``kernel_to_otf`` ifftshifts so that convolution does not translate.
* Everything is f32 real / c64 spectral; batching is over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def kernel_to_otf(kernel: jnp.ndarray) -> jnp.ndarray:
    """Centered real kernel [..., H, W] -> OTF [..., H, W//2+1] (rfft2)."""
    return jnp.fft.rfft2(jnp.fft.ifftshift(kernel, axes=(-2, -1)))


def convolve_otf(img: jnp.ndarray, otf: jnp.ndarray, shape=None) -> jnp.ndarray:
    """Circular convolution of ``img`` [..., H, W] with a precomputed OTF."""
    if shape is None:
        shape = img.shape[-2:]
    return jnp.fft.irfft2(jnp.fft.rfft2(img) * otf, s=shape)


def correlate_otf(img: jnp.ndarray, otf: jnp.ndarray, shape=None) -> jnp.ndarray:
    """Circular cross-correlation: ``out(r) = sum_a img(a) k(a - r)``.

    Equivalent to convolving with the flipped kernel; in the spectral domain
    that is multiplication by ``conj(otf)``. Used by Richardson-Lucy's
    transpose step and by the analytic system-kernel engines.
    """
    if shape is None:
        shape = img.shape[-2:]
    return jnp.fft.irfft2(jnp.fft.rfft2(img) * jnp.conj(otf), s=shape)


def fft_convolve(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """One-shot circular convolution with a centered kernel."""
    return convolve_otf(img, kernel_to_otf(kernel))


def fft_correlate(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """One-shot circular correlation with a centered kernel."""
    return correlate_otf(img, kernel_to_otf(kernel))


def convolve_profiles(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Circular 1D convolution of two centered profiles -> centered profile."""
    n = a.shape[-1]
    spec = (jnp.fft.rfft(jnp.fft.ifftshift(a))
            * jnp.fft.rfft(jnp.fft.ifftshift(b)))
    return jnp.fft.fftshift(jnp.fft.irfft(spec, n=n))


def circulant_matrix(profile: jnp.ndarray) -> jnp.ndarray:
    """Centered 1D kernel [W] -> circulant matrix M[a, x] = k(x - a), [W, W].

    ``img @ M`` is circular convolution along the last axis as ONE matmul --
    on TPU the MXU crushes a W x W matmul at these sizes, so scan engines use
    this instead of per-step FFTs when they need explicit camera frames.
    """
    w = profile.shape[-1]
    x = jnp.arange(w)
    idx = (x[None, :] - x[:, None] + w // 2) % w
    return profile[idx]


def profile_to_otf1d(profile: jnp.ndarray) -> jnp.ndarray:
    """Centered 1D kernel [n] -> 1D OTF [n//2+1] (rfft)."""
    return jnp.fft.rfft(jnp.fft.ifftshift(profile, axes=-1))


def convolve_otf1d(img: jnp.ndarray, otf: jnp.ndarray, axis: int,
                   n: int) -> jnp.ndarray:
    """Circular 1D convolution along ``axis`` with a precomputed 1D OTF."""
    spec = jnp.fft.rfft(img, axis=axis)
    shape = [1] * spec.ndim
    shape[axis] = otf.shape[-1]
    return jnp.fft.irfft(spec * otf.reshape(shape), n=n, axis=axis)
