"""Camera-frame synthesis tests: frames match the per-step scan bodies."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
)
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import (
    line_sted_camera_frames,
    point_sted_camera_frames,
)
from tests.oracle import oracle


SHAPE = (32, 32)
SAMPLE = samples.rings(SHAPE, period=10.0)


def test_line_frames_match_oracle_step():
    params = LineSTEDParams.create(sigma_exc=2.0, sigma_det=2.0,
                                   stripe_period=8.0, depletion=4.0,
                                   brightness=30.0)
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    frames = np.asarray(line_sted_camera_frames(
        SAMPLE, params, geom, jnp.asarray([5, 20])))
    s = np.asarray(SAMPLE, np.float64)
    eff = oracle.effective_psf(oracle.line_excitation_profile(32, 2.0),
                               oracle.stripe_depletion_profile(32, 8.0), 4.0)
    det = oracle.detection_psf(SHAPE, 2.0)
    for i, x0 in enumerate((5, 20)):
        ill = oracle.shift_profile_to(eff, x0)[None, :]
        want = 30.0 * oracle.fft_convolve(s * ill, det)
        err = np.linalg.norm(frames[i] - want) / np.linalg.norm(want)
        assert err < 1e-5


def test_point_frames_shapes_and_noise():
    params = PointSTEDParams.create(depletion=4.0, brightness=30.0)
    geom = PointSTEDGeometry(Grid(*SHAPE), chunk=32)
    pos = jnp.asarray([[8, 8], [16, 24]])
    clean = point_sted_camera_frames(SAMPLE, params, geom, pos)
    noisy = point_sted_camera_frames(SAMPLE, params, geom, pos,
                                     key=jax.random.key(0))
    assert clean.shape == noisy.shape == (2, 32, 32)
    n = np.asarray(noisy)
    assert (n == np.round(n)).all()
    # frame energy concentrates near the scan position
    c = np.asarray(clean[0])
    assert c[8, 8] > 4 * c[24, 24]
