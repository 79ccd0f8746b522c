"""FFT convolution kernel tests (C3): direct-sum parity, oracle parity."""

import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.kernels import fftconv
from tests.oracle import oracle


def _direct_circular_convolve(img, kernel_centered):
    """O(N^4) direct circular convolution with a centered kernel."""
    h, w = img.shape
    cy, cx = h // 2, w // 2
    out = np.zeros_like(img, dtype=np.float64)
    for y in range(h):
        for x in range(w):
            acc = 0.0
            for dy in range(h):
                for dx in range(w):
                    # kernel value at offset (y - dy, x - dx)
                    acc += img[dy, dx] * kernel_centered[(y - dy + cy) % h,
                                                         (x - dx + cx) % w]
            out[y, x] = acc
    return out


def test_convolve_matches_direct_sum():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(8, 8))
    ker = rng.uniform(size=(8, 8))
    got = np.asarray(fftconv.fft_convolve(jnp.asarray(img, jnp.float32),
                                          jnp.asarray(ker, jnp.float32)))
    want = _direct_circular_convolve(img, ker)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_correlate_is_flipped_convolve():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(16, 16)), jnp.float32)
    ker = jnp.asarray(rng.uniform(size=(16, 16)), jnp.float32)
    from rescan_line_sted_tpu.imaging.shifts import flip_centered
    corr = fftconv.fft_correlate(img, ker)
    conv_flipped = fftconv.fft_convolve(img, flip_centered(ker))
    np.testing.assert_allclose(np.asarray(corr), np.asarray(conv_flipped),
                               rtol=1e-4, atol=1e-5)


def test_matches_oracle_convention():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(32, 32))
    ker = oracle.gaussian_psf((32, 32), 2.0)
    got = np.asarray(fftconv.fft_convolve(jnp.asarray(img, jnp.float32),
                                          jnp.asarray(ker, jnp.float32)),
                     np.float64)
    want = oracle.fft_convolve(img, ker)
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-5


def test_batched_convolve():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(size=(4, 16, 16)), jnp.float32)
    ker = jnp.asarray(oracle.gaussian_psf((16, 16), 1.5), jnp.float32)
    otf = fftconv.kernel_to_otf(ker)
    batched = fftconv.convolve_otf(imgs, otf)
    for i in range(4):
        single = fftconv.convolve_otf(imgs[i], otf)
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single),
                                   rtol=1e-5, atol=1e-6)
