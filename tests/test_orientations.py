"""Multi-orientation acquisition + RL fusion tests (C10 + C11; config 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms import richardson_lucy_views
from rescan_line_sted_tpu.algorithms.metrics import fwhm_2d
from rescan_line_sted_tpu.config import Grid, LineSTEDGeometry, LineSTEDParams
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging.orientations import (
    multi_orientation_line_sted,
    orientation_kernels,
)
from rescan_line_sted_tpu.utils.rotate import rotate_image


SHAPE = (64, 64)
PARAMS = LineSTEDParams.create(sigma_exc=2.5, sigma_det=2.5,
                               stripe_period=10.0, depletion=8.0,
                               slit_halfwidth=3.0, brightness=100.0)


def test_rotate_identity_and_periodicity():
    img = samples.rings(SHAPE)
    np.testing.assert_allclose(np.asarray(rotate_image(img, 0.0)),
                               np.asarray(img), atol=1e-6)
    full = rotate_image(img, jnp.pi * 2)
    assert np.abs(np.asarray(full) - np.asarray(img)).max() < 1e-4


def test_rotated_view_equals_zero_angle_view():
    """theta=0 view through the rotate-acquire-derotate path == direct."""
    from rescan_line_sted_tpu.imaging import line_sted_image
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    sample = samples.siemens_star(SHAPE, spokes=6)
    views, kernels = multi_orientation_line_sted(
        sample, PARAMS, geom, jnp.asarray([0.0]))
    direct = line_sted_image(sample, PARAMS, geom).image
    err = (np.linalg.norm(np.asarray(views[0]) - np.asarray(direct))
           / np.linalg.norm(np.asarray(direct)))
    assert err < 1e-5


def test_orientation_kernel_rotates_anisotropy():
    angles = jnp.asarray([0.0, jnp.pi / 2])
    ks = orientation_kernels(SHAPE, PARAMS, angles)
    f0 = fwhm_2d(ks[0])
    f90 = fwhm_2d(ks[1])
    # 90-degree rotation swaps the sharp/wide axes
    assert abs(float(f0[1]) - float(f90[0])) < 0.3
    assert abs(float(f0[0]) - float(f90[1])) < 0.3


def test_fusion_recovers_isotropic_resolution():
    """Two orthogonal anisotropic views fuse into a sharper, isotropic image."""
    sample = samples.sparse_points(SHAPE, spacing=32)
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    angles = jnp.asarray([0.0, jnp.pi / 2])
    views, kernels = multi_orientation_line_sted(sample, PARAMS, geom, angles)
    fused = richardson_lucy_views(views, kernels, num_iter=100)
    # Measure the restored point at (16, 16)
    patch = jax.lax.dynamic_slice(fused, (8, 8), (16, 16))
    py, px = fwhm_2d(jnp.roll(patch, (0, 0), (0, 1)))  # peak at patch center
    ky, kx = fwhm_2d(kernels[0])
    # fused resolution beats the single-view wide axis in y...
    assert float(py) < 0.7 * float(ky)
    # ...and is roughly isotropic
    assert 0.6 < float(py) / float(px) < 1.7


def test_noisy_fusion_runs_and_is_positive():
    sample = samples.siemens_star(SHAPE, spokes=6) + 0.01
    geom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    angles = jnp.asarray([0.0, jnp.pi / 3, 2 * jnp.pi / 3])
    views, kernels = multi_orientation_line_sted(
        sample, PARAMS, geom, angles, key=jax.random.key(1))
    fused = richardson_lucy_views(views, kernels, num_iter=10)
    arr = np.asarray(fused)
    assert np.isfinite(arr).all()
    assert (arr >= 0).all()
