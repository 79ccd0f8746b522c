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


def test_correlate_otf_at_matches_full_correlation():
    """Spectral single-pixel readout == full correlate_otf + gather, on
    even and odd grid sizes (the odd case exercises the hermitian-fold
    weights without a Nyquist column)."""
    rng = np.random.default_rng(7)
    for h, w in [(16, 16), (16, 24), (15, 17), (32, 15)]:
        img = jnp.asarray(rng.random((5, h, w)), jnp.float32)
        ker = jnp.asarray(rng.random((h, w)), jnp.float32)
        otf = fftconv.kernel_to_otf(ker)
        pos = jnp.asarray(rng.integers(0, [h, w], size=(5, 2)), jnp.int32)
        full = fftconv.correlate_otf(img, otf)
        want = full[jnp.arange(5), pos[:, 0], pos[:, 1]]
        got = fftconv.correlate_otf_at(img, otf, pos)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_correlate_otf_at_large_coordinate_phase():
    """Phase reduction must stay exact when ky * y overflows f32's
    exact-integer range (~2^24): probe the far corner of a 512^2 grid,
    where naive f32 phase accumulation would be off by radians."""
    rng = np.random.default_rng(11)
    h = w = 512
    img = jnp.zeros((1, h, w), jnp.float32).at[0, h - 3, w - 2].set(1.0)
    ker = jnp.asarray(rng.random((h, w)), jnp.float32)
    otf = fftconv.kernel_to_otf(ker)
    pos = jnp.asarray([[h - 1, w - 1]], jnp.int32)
    want = fftconv.correlate_otf(img, otf)[0, h - 1, w - 1]
    got = fftconv.correlate_otf_at(img, otf, pos)[0]
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-5)


def test_circulant_matrix_indexing():
    """Gather-free build == the modular-index definition
    M[a, x] = p[(x - a + w//2) % w], even and odd widths."""
    rng = np.random.default_rng(3)
    for w in (8, 9, 33, 64):
        p = rng.random(w).astype(np.float32)
        x = np.arange(w)
        want = p[(x[None, :] - x[:, None] + w // 2) % w]
        got = np.asarray(fftconv.circulant_matrix(jnp.asarray(p)))
        np.testing.assert_array_equal(got, want)


def test_circulant_window_matches_matrix_window():
    """Profile-direct band window == windowing the full transposed
    circulant (the banded engines' table construction)."""
    rng = np.random.default_rng(4)
    for w, d_r, d_c, s_r, s_c in [(64, 48, 32, 20, 12), (64, 8, 8, 0, 0),
                                  (33, 16, 10, 7, 3), (64, 48, 32, -4, 40)]:
        p = rng.random(w).astype(np.float32)
        gx_t = np.asarray(fftconv.circulant_matrix(jnp.asarray(p))).T
        want = gx_t[(np.arange(d_r) - s_r) % w][:, (np.arange(d_c) - s_c) % w]
        got = np.asarray(fftconv.circulant_window(jnp.asarray(p),
                                                  d_r, d_c, s_r, s_c))
        np.testing.assert_array_equal(got, want)
