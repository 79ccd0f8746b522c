"""Fused per-step-noise megakernel tests (VERDICT r1 item 4).

On CPU the engines fall back to the lax.scan per-step path (the Pallas
interpreter's PRNG yields zeros), so CPU tests cover the fallback contract
and shapes; the in-kernel hardware-PRNG statistics are validated by the
TPU-gated test (run with RLS_TEST_TPU=1 on hardware; also exercised by
/tmp-level drives and bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.imaging import (
    line_sted_image,
    rescanned_line_sted_image,
)

PARAMS = LineSTEDParams.create(sigma_exc=2.0, sigma_det=2.5,
                               stripe_period=9.0, depletion=4.0,
                               slit_halfwidth=3.0, brightness=100.0)


def test_per_step_cpu_fallback_statistics():
    """Off-TPU the per-step path still produces correct first moments."""
    geom = LineSTEDGeometry(Grid(48, 48), chunk=16)
    sample = jnp.ones((48, 48)) * 3.0
    mean = np.asarray(line_sted_image(sample, PARAMS, geom,
                                      method="scan").image)
    draws = np.stack([
        np.asarray(line_sted_image(sample, PARAMS, geom, key=jax.random.key(i),
                                   method="scan", noise_mode="per_step").image)
        for i in range(8)])
    sel = mean > 20
    rel = abs(draws.mean(0)[sel] - mean[sel]).mean() / mean[sel].mean()
    assert rel < 0.05


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel hardware PRNG needs a real TPU")
def test_fused_per_step_hardware_statistics():
    """Fused megakernel per-frame draws: mean matches, variance is Poisson."""
    size = 256
    key0 = jax.random.key(7)
    sample = jax.random.uniform(key0, (size, size), jnp.float32) * 5.0
    lgeom = LineSTEDGeometry(Grid(size, size), chunk=32)
    rgeom = RescanGeometry(Grid(size, size), rescan_factor=2.0, chunk=32)
    n = 24
    for make in (
        lambda s, k: line_sted_image(s, PARAMS, lgeom, key=k, method="scan",
                                     noise_mode="per_step").image,
        lambda s, k: rescanned_line_sted_image(
            s, PARAMS, rgeom, key=k, method="scan",
            noise_mode="per_step").image,
    ):
        f = jax.jit(make)
        mean = np.asarray(jax.jit(lambda s: make(s, None))(sample))
        draws = np.stack([np.asarray(f(sample, k))
                          for k in jax.random.split(key0, n)])
        sel = mean > 20.0
        rel = np.abs(draws.mean(0)[sel] - mean[sel]).mean() / mean[sel].mean()
        var_ratio = (draws.var(0, ddof=1)[sel]
                     / np.maximum(mean[sel], 1e-9)).mean()
        assert rel < 0.03
        assert 0.93 < var_ratio < 1.07


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel hardware PRNG needs a real TPU")
def test_hybrid_fractional_r_per_step_hardware_statistics():
    """The transposed tiered-sampling hybrid (the per-step engine for
    FRACTIONAL rescan factors): draw mean matches the noise-free canvas,
    and the canvas total (photon count, conserved by band-limited
    placement) has Poisson variance."""
    size = 256
    key0 = jax.random.key(11)
    sample = jax.random.uniform(key0, (size, size), jnp.float32) * 5.0
    geom = RescanGeometry(Grid(size, size), rescan_factor=1.5, chunk=32)
    make = lambda s, k: rescanned_line_sted_image(  # noqa: E731
        s, PARAMS, geom, key=k, method="scan", noise_mode="per_step").image
    f = jax.jit(make)
    mean = np.asarray(jax.jit(lambda s: make(s, None))(sample))
    n = 24
    draws = np.stack([np.asarray(f(sample, k))
                      for k in jax.random.split(key0, n)])
    sel = mean > 20.0
    rel = np.abs(draws.mean(0)[sel] - mean[sel]).mean() / mean[sel].mean()
    assert rel < 0.03
    totals = draws.sum(axis=(1, 2))
    # total photons are a Poisson sum: var/mean within loose n=24 bounds
    ratio = totals.var(ddof=1) / mean.sum()
    assert 0.4 < ratio < 2.5, ratio


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel hardware PRNG needs a real TPU")
def test_line_per_step_hybrid_fallback_statistics():
    """The transposed tiered-sampling fallback used when the fused line
    kernel is excluded (very large widths / too-small slit windows):
    forced here via an undersized slit_support at a small size."""
    size = 128
    key0 = jax.random.key(21)
    sample = jax.random.uniform(key0, (size, size), jnp.float32) * 5.0
    geom = LineSTEDGeometry(Grid(size, size), chunk=32)
    make = lambda s, k: line_sted_image(  # noqa: E731
        s, PARAMS, geom, key=k, method="scan", noise_mode="per_step",
        slit_support=4).image  # < 2*halfwidth+2 -> fused excluded
    f = jax.jit(make)
    mean = np.asarray(jax.jit(lambda s: make(s, None))(sample))
    ref = np.asarray(jax.jit(lambda s: line_sted_image(
        s, PARAMS, geom, method="scan").image)(sample))
    np.testing.assert_allclose(mean, ref, rtol=1e-5, atol=1e-3)
    draws = np.stack([np.asarray(f(sample, k))
                      for k in jax.random.split(key0, 16)])
    sel = mean > 20.0
    rel = np.abs(draws.mean(0)[sel] - mean[sel]).mean() / mean[sel].mean()
    var_ratio = (draws.var(0, ddof=1)[sel]
                 / np.maximum(mean[sel], 1e-9)).mean()
    assert rel < 0.05
    assert 0.9 < var_ratio < 1.12
    a = np.asarray(f(sample, jax.random.key(5)))
    np.testing.assert_array_equal(a, np.asarray(f(sample, jax.random.key(5))))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel hardware PRNG needs a real TPU")
def test_fused_per_step_deterministic_in_key():
    """Same key -> bit-identical noisy image (seed derives from the key)."""
    size = 128
    sample = jax.random.uniform(jax.random.key(3), (size, size)) * 5.0
    geom = LineSTEDGeometry(Grid(size, size), chunk=32)
    f = jax.jit(lambda s, k: line_sted_image(
        s, PARAMS, geom, key=k, method="scan", noise_mode="per_step").image)
    a = np.asarray(f(sample, jax.random.key(11)))
    b = np.asarray(f(sample, jax.random.key(11)))
    c = np.asarray(f(sample, jax.random.key(12)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
