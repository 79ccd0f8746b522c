"""Dose-matched sweep tests (C8; config 4)."""

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
from rescan_line_sted_tpu.physics.dose import line_sted_dose, point_sted_dose
from rescan_line_sted_tpu.sweeps import dose_matched_sweep


SHAPE = (48, 48)
SAMPLE = samples.siemens_star(SHAPE, spokes=8)
PGEOM = PointSTEDGeometry(Grid(*SHAPE), chunk=48)
LGEOM = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
PBASE = PointSTEDParams.create(sigma_exc=2.0, sigma_det=2.0, sigma_dep=2.0,
                               pinhole_radius=2.5, brightness=1.0)
LBASE = LineSTEDParams.create(sigma_exc=2.0, sigma_det=2.0, stripe_period=8.0,
                              slit_halfwidth=2.5, brightness=1.0)
POWERS = jnp.asarray([0.0, 2.0, 8.0])


def test_sweep_shapes_and_monotonic_resolution():
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=100.0, orientations=2)
    assert res.point.image.shape == (3, *SHAPE)
    assert res.line.image.shape == (3, *SHAPE)
    # resolution improves (FWHM shrinks) with depletion power
    fx = np.asarray(res.point.fwhm_x)
    assert fx[0] > fx[1] > fx[2]
    lx = np.asarray(res.line.fwhm_x)
    assert lx[0] > lx[1] > lx[2]


def test_dose_is_matched():
    """exposure * total_dose == budget for every sweep point and modality."""
    budget = 250.0
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=budget, orientations=3)
    for i, s in enumerate(np.asarray(POWERS)):
        pd = point_sted_dose(PBASE.replace(depletion=jnp.float32(s)), PGEOM)
        ld = line_sted_dose(LBASE.replace(depletion=jnp.float32(s)), LGEOM)
        np.testing.assert_allclose(
            float(res.point.exposure[i]) * float(pd.total_dose), budget,
            rtol=1e-5)
        np.testing.assert_allclose(
            float(res.line.exposure[i]) * float(ld.total_dose) * 3, budget,
            rtol=1e-5)


def test_line_needs_fewer_steps():
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=100.0, orientations=2)
    # line: W steps per orientation vs point: W*H
    assert np.all(np.asarray(res.line.num_steps)
                  < np.asarray(res.point.num_steps))


def test_signal_decreases_with_depletion_at_fixed_dose():
    """More depletion power burns budget without adding signal."""
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=100.0)
    sig = np.asarray(res.point.emitted_signal)
    assert sig[0] > sig[1] > sig[2]


def test_sweep_jits_as_one_program_with_noise():
    f = jax.jit(lambda powers, key: dose_matched_sweep(
        SAMPLE, PBASE, LBASE, PGEOM, LGEOM, powers, 100.0, key=key))
    res = f(POWERS, jax.random.key(0))
    assert np.isfinite(np.asarray(res.point.image)).all()
    assert np.isfinite(np.asarray(res.line.image)).all()
    # determinism: same key -> identical result
    res2 = f(POWERS, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(res.line.image),
                                  np.asarray(res2.line.image))


def test_sweep_with_rescan_arm():
    from rescan_line_sted_tpu.config import RescanGeometry
    rgeom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0)
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=100.0, key=jax.random.key(1),
                             rescan_geom=rgeom)
    assert res.rescan is not None
    assert res.rescan.image.shape == (3, SHAPE[0], 2 * SHAPE[1])
    # same dose/steps as the descanned line arm (only detection differs)
    np.testing.assert_allclose(np.asarray(res.rescan.exposure),
                               np.asarray(res.line.exposure))
    # rescan resolution (sample scale) improves with depletion
    fx = np.asarray(res.rescan.fwhm_x)
    assert fx[0] > fx[-1]


def test_sweep_fuse_orientations_isotropic_at_high_s():
    """The paper's protocol (VERDICT r1 item 3): with fuse_orientations the
    line/rescan arms report N-orientation RL-fused images and achieved
    resolutions; at high depletion the fused resolution is isotropic."""
    from rescan_line_sted_tpu.config import RescanGeometry

    rgeom = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, chunk=16)
    powers = jnp.asarray([0.0, 8.0])
    res = jax.jit(lambda p: dose_matched_sweep(
        SAMPLE, PBASE, LBASE, PGEOM, LGEOM, p, 100.0, orientations=2,
        rescan_geom=rgeom, fuse_orientations=True, fusion_iters=25))(powers)
    # fused images live on the sample grid for every arm
    assert res.line.image.shape == (2, *SHAPE)
    assert res.rescan.image.shape == (2, *SHAPE)
    l_fx, l_fy = np.asarray(res.line.fwhm_x), np.asarray(res.line.fwhm_y)
    assert np.all(np.isfinite(l_fx)) and np.all(np.isfinite(l_fy))
    # isotropy at high s (two orthogonal views)
    np.testing.assert_allclose(l_fy[-1], l_fx[-1], rtol=0.05)
    r_fx, r_fy = np.asarray(res.rescan.fwhm_x), np.asarray(res.rescan.fwhm_y)
    np.testing.assert_allclose(r_fy[-1], r_fx[-1], rtol=0.05)
    # resolution still improves with depletion after fusion
    assert l_fx[-1] < l_fx[0]
    assert r_fx[-1] < r_fx[0]


def test_sweep_with_ism_arm():
    """The beyond-reference ISM arm: same illumination/dose as the point
    arm, canvas-grid images, sharper-than-descanned-point resolution."""
    from rescan_line_sted_tpu.config import RescanPointGeometry

    igeom = RescanPointGeometry(Grid(*SHAPE), rescan_factor=2.0, chunk=48)
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=100.0, ism_geom=igeom)
    assert res.ism is not None
    assert res.ism.image.shape == (3, 96, 96)
    np.testing.assert_allclose(np.asarray(res.ism.exposure),
                               np.asarray(res.point.exposure), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.ism.emitted_signal),
                               np.asarray(res.point.emitted_signal),
                               rtol=1e-6)
    # at s=0 (matched widths) pixel reassignment beats descanned detection
    # -- the classic ISM gain; at high s with FIXED R=2 the reassigned
    # kernel becomes detection-limited while the descanned kernel tracks
    # the shrinking illumination, so no all-power claim is made
    fx = np.asarray(res.ism.fwhm_x)
    assert fx[0] < np.asarray(res.point.fwhm_x)[0]
    # resolution still improves with depletion
    assert fx[2] < fx[1] < fx[0]


def test_sweep_ism_arm_fused_protocol():
    from rescan_line_sted_tpu.config import RescanPointGeometry

    igeom = RescanPointGeometry(Grid(*SHAPE), rescan_factor=2.0, chunk=48)
    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM,
                             POWERS[:2], dose_budget=100.0, ism_geom=igeom,
                             fuse_orientations=True, fusion_iters=10)
    # deconvolved canvas, still canvas-shaped; achieved resolution isotropic
    # and sharper than the raw (undeconvolved) ISM kernel
    assert res.ism.image.shape == (2, 96, 96)
    fx, fy = np.asarray(res.ism.fwhm_x), np.asarray(res.ism.fwhm_y)
    np.testing.assert_allclose(fx, fy, rtol=0.15)
    raw = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS[:2],
                             dose_budget=100.0, ism_geom=igeom)
    assert (fx < np.asarray(raw.ism.fwhm_x)[:2] + 1e-3).all()


def test_sweep_frc_columns():
    """frc=True adds achieved-with-noise FRC resolution columns per arm
    (VERDICT r2 item 8)."""
    import pytest

    res = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                             dose_budget=5000.0, key=jax.random.key(0),
                             frc=True)
    for arm in (res.point, res.line):
        frc = np.asarray(arm.frc_resolution)
        assert frc.shape == (3,)
        # at this photon budget the acquisitions correlate: finite,
        # positive, at-or-above-Nyquist resolutions
        assert np.isfinite(frc).all() and (frc >= 2.0).all()
    # noise-free sweeps refuse frc (two identical draws are meaningless)
    with pytest.raises(ValueError):
        dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                           dose_budget=100.0, frc=True)
    # default: column absent
    res0 = dose_matched_sweep(SAMPLE, PBASE, LBASE, PGEOM, LGEOM, POWERS,
                              dose_budget=100.0, key=jax.random.key(0))
    assert res0.point.frc_resolution is None
