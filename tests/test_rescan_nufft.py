"""NUFFT spreading placement: irrational-R subpixel rescan on the banded
kernel (r4 VERDICT weak #3).

Truly-irrational placement steps have no rational class structure, so
until r5 they stayed on the rDFT hybrid (per-frame K-column DFT matmuls,
~11x behind the banded kernel at 2048^2). The NUFFT mode spreads each
sampled frame with a P = 8 exponential-of-semicircle window across the
two PARITY canvases of a 2x-oversampled fine grid (integer scatter, the
kernel's native operation) and deconvolves the window spectrum once per
image -- type-1 NUFFT semantics, subpixel-exact to ~1e-6.

CPU tests run the kernel in interpret mode (noise-free paths are exact
there); the per-step noise statistics run TPU-gated (hardware PRNG).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.config import Grid, LineSTEDParams, RescanGeometry
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

W = 192  # smallest grid where the 128-aligned band windows engage
SAMPLE = samples.siemens_star((W, W), spokes=10) * 3.0
PARAMS = LineSTEDParams.create(sigma_exc=1.2, sigma_det=1.2,
                               depletion=4.0, brightness=50.0)

IRRATIONAL_CELLS = [
    (1.0 + np.pi / 16, 1),          # transcendental step
    (1.6180339887, 1),              # golden ratio
    (1.0 + np.pi / 8, 2),           # irrational step with binning
    (1.0 + 3.0 / 16.0, 1),          # rational but q = 16 > 8: no classes
]


def _exact(geom):
    os.environ["RLS_BANDED_NUFFT"] = "0"
    try:
        return np.asarray(rescanned_line_sted_image(
            SAMPLE, PARAMS, geom, method="scan",
            use_pallas=False).image, np.float64)
    finally:
        os.environ.pop("RLS_BANDED_NUFFT", None)


@pytest.mark.parametrize("r_factor,binning", IRRATIONAL_CELLS)
def test_nufft_matches_exact_engine(r_factor, binning):
    """Noise-free parity vs the exact rDFT/phase-accumulation engine at
    the 1e-5 engine-parity bar, with the engagement probe proving the
    banded kernel (not a silent fallback) produced the result."""
    geom = RescanGeometry(Grid(W, W), rescan_factor=r_factor,
                          binning=binning, chunk=16)
    exact = _exact(geom)
    got = np.asarray(rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True).image,
        np.float64)
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 1e-5, rel
    # engagement probe: the stage knob corrupts output ONLY inside the
    # banded kernel, so a large deviation proves the NUFFT route engaged
    os.environ["RLS_BANDED_STAGE"] = "conv"
    try:
        probe = np.asarray(rescanned_line_sted_image(
            SAMPLE, PARAMS, geom, method="scan", use_pallas=True).image,
            np.float64)
    finally:
        os.environ.pop("RLS_BANDED_STAGE", None)
    assert np.abs(probe - got).max() / np.abs(got).max() > 1e-3


def test_nufft_opt_out_reverts_to_hybrid():
    """RLS_BANDED_NUFFT=0 must reproduce the pre-r5 routing exactly (the
    hybrid), not some third path: opt-out equals use_pallas=False's
    engine to f32 matmul-order tolerance."""
    geom = RescanGeometry(Grid(W, W), rescan_factor=1.0 + np.pi / 16,
                          chunk=16)
    exact = _exact(geom)
    os.environ["RLS_BANDED_NUFFT"] = "0"
    try:
        hybrid = np.asarray(rescanned_line_sted_image(
            SAMPLE, PARAMS, geom, method="scan",
            use_pallas=True).image, np.float64)
    finally:
        os.environ.pop("RLS_BANDED_NUFFT", None)
    rel = np.abs(hybrid - exact).max() / np.abs(exact).max()
    assert rel < 1e-5, rel


def test_nufft_collapsed_noise_draws_once():
    """Collapsed noise on the NUFFT route: Poisson drawn once on the
    accumulated canvas -- total within shot noise, deterministic in the
    key, different keys differ."""
    geom = RescanGeometry(Grid(W, W), rescan_factor=1.6180339887, chunk=16)
    clean = rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True).image
    k = jax.random.key(11)
    noisy = rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True, key=k).image
    again = rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True, key=k).image
    other = rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True,
        key=jax.random.key(12)).image
    np.testing.assert_array_equal(np.asarray(noisy), np.asarray(again))
    assert not np.array_equal(np.asarray(noisy), np.asarray(other))
    total, expect = float(jnp.sum(noisy)), float(jnp.sum(clean))
    assert abs(total - expect) < 6.0 * np.sqrt(max(expect, 1.0))


def test_nufft_per_step_off_tpu_falls_back():
    """Per-step noise needs the hardware PRNG, so off-TPU the NUFFT route
    must decline and the call lands on the per-step lax.scan fallback --
    noisy output, not a crash, not a silently noise-free canvas."""
    geom = RescanGeometry(Grid(W, W), rescan_factor=1.0 + np.pi / 16,
                          chunk=16)
    clean = rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True).image
    noisy = rescanned_line_sted_image(
        SAMPLE, PARAMS, geom, method="scan", use_pallas=True,
        key=jax.random.key(3), noise_mode="per_step").image
    assert not np.allclose(np.asarray(noisy), np.asarray(clean))
    total, expect = float(jnp.sum(noisy)), float(jnp.sum(clean))
    assert abs(total - expect) < 6.0 * np.sqrt(max(expect, 1.0))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel per-step noise draws from the TPU "
                           "hardware PRNG")
def test_nufft_per_step_noise_statistics_tpu():
    """Hardware: camera-faithful per-step noise through the NUFFT route.
    The noisy canvas total must sit within shot noise of the noise-free
    total, be key-deterministic, and differ across keys."""
    geom = RescanGeometry(Grid(256, 256), rescan_factor=1.0 + np.pi / 16,
                          chunk=32)
    sample = samples.siemens_star((256, 256)) * 4.0
    params = LineSTEDParams.create(depletion=6.0, brightness=500.0)
    clean = rescanned_line_sted_image(
        sample, params, geom, method="scan").image
    k = jax.random.key(int.from_bytes(os.urandom(4), "little"))
    noisy = rescanned_line_sted_image(
        sample, params, geom, method="scan", key=k,
        noise_mode="per_step").image
    again = rescanned_line_sted_image(
        sample, params, geom, method="scan", key=k,
        noise_mode="per_step").image
    np.testing.assert_array_equal(np.asarray(noisy), np.asarray(again))
    total, expect = float(jnp.sum(noisy)), float(jnp.sum(clean))
    z = abs(total - expect) / np.sqrt(max(expect, 1.0))
    assert z < 6.0, (total, expect, z)
    # per-pixel scatter consistent with Poisson counts (not noise-free)
    assert not np.allclose(np.asarray(noisy), np.asarray(clean))
