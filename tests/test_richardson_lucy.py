"""Richardson-Lucy tests (C11): fixed points, convergence, oracle parity."""

import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms import richardson_lucy, richardson_lucy_views
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import psf as psfs
from tests.oracle import oracle


SHAPE = (48, 48)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def test_delta_psf_fixed_point():
    """With a delta PSF, any positive image is an RL fixed point."""
    img = samples.rings(SHAPE) + 0.1
    delta = jnp.zeros(SHAPE).at[24, 24].set(1.0)
    out = richardson_lucy(img, delta, num_iter=5)
    assert rel_err(out, img) < 1e-5


def test_noise_free_convergence():
    """RL on noise-free data converges toward the true sample."""
    true = samples.rings(SHAPE, period=16.0) + 0.05
    psf = psfs.detection_psf(SHAPE, 1.5)
    data = fftconv.fft_convolve(true, psf)
    est0 = richardson_lucy(data, psf, num_iter=1)
    est = richardson_lucy(data, psf, num_iter=150)
    assert rel_err(est, true) < rel_err(est0, true)
    assert rel_err(est, true) < 0.05


def test_matches_oracle_multiview():
    true = samples.siemens_star(SHAPE, spokes=6) + 0.02
    p1 = psfs.detection_psf(SHAPE, 2.0)
    p2 = np.asarray(psfs.detection_psf(SHAPE, 1.2))
    data1 = fftconv.fft_convolve(true, p1)
    data2 = fftconv.fft_convolve(true, jnp.asarray(p2))
    got = richardson_lucy_views(
        jnp.stack([data1, jnp.asarray(data2)]),
        jnp.stack([p1, jnp.asarray(p2)]), num_iter=20)
    want = oracle.richardson_lucy(
        [np.asarray(data1, np.float64), np.asarray(data2, np.float64)],
        [np.asarray(p1, np.float64), p2], num_iter=20)
    assert rel_err(got, want) < 1e-4


def test_flux_roughly_conserved():
    true = samples.rings(SHAPE) + 0.1
    psf = psfs.detection_psf(SHAPE, 2.0)
    data = fftconv.fft_convolve(true, psf)
    est = richardson_lucy(data, psf, num_iter=30)
    assert abs(float(jnp.sum(est)) / float(jnp.sum(data)) - 1.0) < 1e-3


def test_accelerated_rl_converges_faster():
    """Biggs-Andrews acceleration reaches lower error at equal iterations."""
    true = samples.rings(SHAPE, period=16.0) + 0.05
    psf = psfs.detection_psf(SHAPE, 2.0)
    data = fftconv.fft_convolve(true, psf)
    plain = richardson_lucy_views(data[None], psf[None], num_iter=40)
    accel = richardson_lucy_views(data[None], psf[None], num_iter=40,
                                  accelerate=True)
    assert rel_err(accel, true) < rel_err(plain, true)
    # and it's stable: long accelerated runs stay finite and positive
    long = richardson_lucy_views(data[None], psf[None], num_iter=300,
                                 accelerate=True)
    arr = np.asarray(long)
    assert np.isfinite(arr).all() and (arr >= 0).all()
    assert rel_err(long, true) < 0.05
