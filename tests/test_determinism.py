"""Determinism tests (SURVEY.md section 5.2.4): fixed PRNG key =>
bit-identical outputs; jit and eager agree."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import (
    line_sted_image,
    rescanned_line_sted_image,
)


SHAPE = (32, 32)
SAMPLE = samples.siemens_star(SHAPE, spokes=6)
PARAMS = LineSTEDParams.create(depletion=4.0, brightness=80.0)


def test_fixed_key_bit_identical_across_runs():
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    a = line_sted_image(SAMPLE, PARAMS, geom, key=jax.random.key(7)).image
    b = line_sted_image(SAMPLE, PARAMS, geom, key=jax.random.key(7)).image
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jit_vs_eager_agree():
    geom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, chunk=16)

    def f(s, key):
        return rescanned_line_sted_image(s, PARAMS, geom, key=key,
                                         method="scan").image

    key = jax.random.key(3)
    eager = f(SAMPLE, key)
    jitted = jax.jit(f)(SAMPLE, key)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-6, atol=1e-4)


def test_different_keys_differ():
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    a = line_sted_image(SAMPLE, PARAMS, geom, key=jax.random.key(0)).image
    b = line_sted_image(SAMPLE, PARAMS, geom, key=jax.random.key(1)).image
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0


def test_subpixel_scan_deterministic_and_key_sensitive():
    """The rfft-accumulation subpixel path: fixed key -> identical noisy
    canvas; different key -> different."""
    import jax

    from rescan_line_sted_tpu.config import Grid, RescanGeometry, RescanParams
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    sample = jnp.ones((32, 32)) * 4.0
    geom = RescanGeometry(Grid(32, 32), rescan_factor=1.5, chunk=16)
    params = RescanParams.create(brightness=50.0)
    f = jax.jit(lambda s, k: rescanned_line_sted_image(
        s, params, geom, key=k, method="scan",
        noise_mode="per_step").image)
    a = np.asarray(f(sample, jax.random.key(5)))
    b = np.asarray(f(sample, jax.random.key(5)))
    c = np.asarray(f(sample, jax.random.key(6)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
