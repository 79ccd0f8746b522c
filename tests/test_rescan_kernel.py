"""Pallas rescan scatter-add kernel vs the XLA scatter fallback (C6/C17)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.kernels.rescan_accumulate import (
    rescan_accumulate,
    rescan_accumulate_reference,
)


def _case(n=7, h=16, w=24, wc=48, seed=0):
    rng = np.random.default_rng(seed)
    canvas = jnp.asarray(rng.uniform(size=(h, wc)), jnp.float32)
    frames = jnp.asarray(rng.uniform(size=(n, h, w)), jnp.float32)
    offsets = jnp.asarray(rng.integers(0, wc, size=(n,)), jnp.int32)
    return canvas, frames, offsets


def test_reference_scatter_add_accumulates_duplicates():
    canvas = jnp.zeros((4, 8), jnp.float32)
    frames = jnp.ones((3, 4, 4), jnp.float32)
    offsets = jnp.asarray([0, 0, 6], jnp.int32)  # duplicate + wrap
    out = np.asarray(rescan_accumulate_reference(canvas, frames, offsets))
    np.testing.assert_allclose(out[:, 0], 3.0)   # two at 0 + wrap of 6
    np.testing.assert_allclose(out[:, 1], 3.0)
    np.testing.assert_allclose(out[:, 2], 2.0)
    np.testing.assert_allclose(out[:, 6], 1.0)
    np.testing.assert_allclose(out[:, 4], 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_kernel_matches_reference(seed):
    canvas, frames, offsets = _case(seed=seed)
    want = rescan_accumulate_reference(canvas, frames, offsets)
    got = rescan_accumulate(canvas, frames, offsets, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_pallas_kernel_wrap_heavy():
    # every frame wraps around the canvas end
    canvas, frames, _ = _case(n=5, w=24, wc=32)
    offsets = jnp.asarray([30, 31, 25, 9, 16], jnp.int32)
    want = rescan_accumulate_reference(canvas, frames, offsets)
    got = rescan_accumulate(canvas, frames, offsets, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_pallas_kernel_under_vmap():
    b = 3
    cases = [_case(seed=s) for s in range(b)]
    canvases = jnp.stack([c[0] for c in cases])
    frames = jnp.stack([c[1] for c in cases])
    offsets = jnp.stack([c[2] for c in cases])
    got = jax.vmap(
        lambda c, f, o: rescan_accumulate(c, f, o, use_pallas=True)
    )(canvases, frames, offsets)
    for i in range(b):
        want = rescan_accumulate_reference(canvases[i], frames[i], offsets[i])
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)


def test_rescan_factor_validation():
    from rescan_line_sted_tpu.config import Grid, RescanGeometry

    with pytest.raises(ValueError):
        RescanGeometry(Grid(32, 32), rescan_factor=0.5)
