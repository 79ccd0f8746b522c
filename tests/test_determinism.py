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
