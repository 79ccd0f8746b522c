"""Gradient-based MAP deconvolution tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms import map_deconvolve_views
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import psf as psfs


SHAPE = (48, 48)


def test_loss_decreases_and_recovers():
    true = samples.rings(SHAPE, period=14.0) + 0.05
    psf = psfs.detection_psf(SHAPE, 1.8)
    data = 50.0 * fftconv.fft_convolve(true, psf)
    est, losses = map_deconvolve_views(data[None], psf[None], num_steps=300,
                                       learning_rate=0.1)
    l = np.asarray(losses)
    assert l[-1] < l[0]
    est = np.asarray(est) / 50.0
    blur_err = np.linalg.norm(np.asarray(data) / 50.0 - np.asarray(true))
    est_err = np.linalg.norm(est - np.asarray(true))
    assert est_err < 0.6 * blur_err  # sharper than the blurred input
    assert (est >= 0).all()


def test_multiview_anisotropic_fusion():
    true = samples.sparse_points(SHAPE, spacing=24) * 100.0
    # two orthogonal anisotropic PSFs
    y = jnp.arange(48.0)[:, None] - 24
    x = jnp.arange(48.0)[None, :] - 24
    p1 = jnp.exp(-(y / 4.0) ** 2 / 2 - (x / 1.2) ** 2 / 2)
    p1 = p1 / p1.sum()
    p2 = p1.T
    data = jnp.stack([fftconv.fft_convolve(true, p1),
                      fftconv.fft_convolve(true, p2)])
    est, _ = map_deconvolve_views(data, jnp.stack([p1, p2]), num_steps=1500,
                                  learning_rate=0.2)
    est = np.asarray(est)
    # restored point is tighter than either PSF's wide axis (FWHM ~9.4 px)
    peak = np.unravel_index(est.argmax(), est.shape)
    row = est[peak[0], :]
    width = (row > 0.5 * row.max()).sum()
    assert width <= 8


def test_jit_and_tv():
    true = samples.rings(SHAPE) + 0.05
    psf = psfs.detection_psf(SHAPE, 1.5)
    data = 20.0 * fftconv.fft_convolve(true, psf)
    f = jax.jit(lambda d: map_deconvolve_views(
        d[None], psf[None], num_steps=50, tv_weight=0.1)[0])
    out = np.asarray(f(data))
    assert np.isfinite(out).all()
