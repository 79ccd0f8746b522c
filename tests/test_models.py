"""Pluggable illumination-model seam (physics/models.py; VERDICT r2 item 4).

The engines must build illumination through ``params.model`` so a user can
swap the donut/stripe generator without touching ``physics/psf.py``; the
default (model=None) path must be bit-identical to the closed forms.
"""

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
from rescan_line_sted_tpu.imaging import line_sted_image, point_sted_image
from rescan_line_sted_tpu.physics import psf as psfs
from rescan_line_sted_tpu.physics.models import (
    EnvelopedStripeModel,
    GaussianDonutModel,
    GaussianStripeModel,
    PupilDonutModel,
)

SHAPE = (64, 64)
SAMPLE = samples.siemens_star(SHAPE, spokes=6)


def test_default_model_bit_identical():
    """model=None and the explicit default model produce identical images."""
    geom = PointSTEDGeometry(Grid(*SHAPE))
    base = PointSTEDParams.create(depletion=4.0, brightness=50.0)
    expl = PointSTEDParams.create(depletion=4.0, brightness=50.0,
                                  model=GaussianDonutModel())
    a = point_sted_image(SAMPLE, base, geom).image
    b = point_sted_image(SAMPLE, expl, geom).image
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lgeom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    lb = LineSTEDParams.create(depletion=4.0, brightness=50.0)
    le = LineSTEDParams.create(depletion=4.0, brightness=50.0,
                               model=GaussianStripeModel())
    np.testing.assert_array_equal(
        np.asarray(line_sted_image(SAMPLE, lb, lgeom).image),
        np.asarray(line_sted_image(SAMPLE, le, lgeom).image))


def test_pupil_donut_physics():
    """Vortex-pupil donut: exact on-axis zero, calibrated ring radius."""
    p = PointSTEDParams.create(sigma_dep=4.0)
    dep = np.asarray(PupilDonutModel().depletion((128, 128), p))
    c = 64
    assert dep[c, c] < 1e-6                 # vortex null
    assert abs(dep.max() - 1.0) < 1e-6      # peak-normalized
    row = dep[c]
    ring = np.argmax(row[c:])               # first ring, pixels from center
    want = np.sqrt(2.0) * 4.0               # matched to the default donut
    assert abs(ring - want) / want < 0.15


def test_pupil_donut_through_engine():
    """Swapping the donut is a one-argument change; depletion still
    sharpens the image, and s=0 reduces to the same confocal result."""
    geom = PointSTEDGeometry(Grid(*SHAPE))
    kern = jax.jit(
        lambda p: __import__(
            "rescan_line_sted_tpu.imaging.analytic", fromlist=["x"]
        ).point_system_kernel(SHAPE, p))

    for model in (None, PupilDonutModel()):
        p0 = PointSTEDParams.create(depletion=0.0, model=model)
        p8 = PointSTEDParams.create(depletion=8.0, model=model)
        from rescan_line_sted_tpu.algorithms.metrics import fwhm_2d

        f0 = float(fwhm_2d(kern(p0))[1])
        f8 = float(fwhm_2d(kern(p8))[1])
        assert f8 < f0  # STED sharpens under either generator
    # s = 0: the depletion generator is irrelevant -> same confocal kernel
    k_a = kern(PointSTEDParams.create(depletion=0.0))
    k_b = kern(PointSTEDParams.create(depletion=0.0, model=PupilDonutModel()))
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_b), atol=1e-6)
    # and the full engine runs with the swapped model
    img = point_sted_image(
        SAMPLE, PointSTEDParams.create(depletion=8.0, brightness=100.0,
                                       model=PupilDonutModel()),
        geom, key=jax.random.key(0)).image
    assert np.isfinite(np.asarray(img)).all()


def test_enveloped_stripe_through_line_engine():
    lgeom = LineSTEDGeometry(Grid(*SHAPE), chunk=16)
    model = EnvelopedStripeModel(envelope_sigmas=2.0)
    dep = np.asarray(model.depletion(
        64, LineSTEDParams.create(stripe_period=8.0)))
    assert dep[32] < 1e-6                   # zero along the scanned line
    assert abs(dep.max() - 1.0) < 1e-6
    # envelope: far-out maxima are weaker than the first one
    assert dep[32 + 4 + 24] < dep[32 + 4]
    img = line_sted_image(
        SAMPLE, LineSTEDParams.create(depletion=8.0, brightness=100.0,
                                      model=model),
        lgeom, key=jax.random.key(0)).image
    assert np.isfinite(np.asarray(img)).all()


def test_vectorial_donut_polarization_physics():
    """Richards-Wolf vectorial donut (r3): the on-axis null survives ONLY
    with circular polarization co-handed with the vortex; counter-handed
    circular has the charge-0 z-field FILL the null, linear fills it
    partially. The classic STED quarter-wave-plate interlock."""
    from rescan_line_sted_tpu.physics.models import VectorialDonutModel

    p = PointSTEDParams.create(sigma_dep=4.0)
    c = 64
    dep = {}
    for pol in ("circular+", "circular-", "linear-x"):
        d = np.asarray(VectorialDonutModel(na=0.9, polarization=pol)
                       .depletion((128, 128), p))
        assert abs(d.max() - 1.0) < 1e-6
        dep[pol] = d
    assert dep["circular+"][c, c] < 1e-4          # null preserved
    assert dep["circular-"][c, c] > 0.1           # z-field fills the null
    assert dep["circular+"][c, c] < dep["linear-x"][c, c] \
        < dep["circular-"][c, c]                  # partial fill in between
    # paraxial limit: vectorial co-handed -> scalar vortex donut
    from rescan_line_sted_tpu.physics.models import PupilDonutModel
    lo = np.asarray(VectorialDonutModel(na=0.2, polarization="circular+")
                    .depletion((128, 128), p))
    sc = np.asarray(PupilDonutModel().depletion((128, 128), p))
    assert np.abs(lo - sc).max() < 0.05           # few-% apodization residue
    # ring calibration still matched to sigma_dep * sqrt(2) at high NA
    row = dep["circular+"][c]
    ring = np.argmax(row[c:])
    want = np.sqrt(2.0) * 4.0
    assert abs(ring - want) / want < 0.25


def test_vectorial_donut_through_engine():
    """Misaligned polarization measurably degrades STED resolution through
    the full engine -- the model seam carries real alignment physics."""
    from rescan_line_sted_tpu.algorithms.metrics import fwhm_2d
    from rescan_line_sted_tpu.imaging.analytic import point_system_kernel
    from rescan_line_sted_tpu.physics.models import VectorialDonutModel

    kern = jax.jit(lambda p: point_system_kernel(SHAPE, p))
    f = {}
    for pol in ("circular+", "circular-"):
        p8 = PointSTEDParams.create(
            depletion=8.0, model=VectorialDonutModel(polarization=pol))
        f[pol] = float(fwhm_2d(kern(p8))[1])
    f0 = float(fwhm_2d(kern(PointSTEDParams.create(depletion=0.0)))[1])
    assert f["circular+"] < f["circular-"] <= f0 * 1.05
    img = point_sted_image(
        SAMPLE, PointSTEDParams.create(
            depletion=8.0, brightness=100.0,
            model=VectorialDonutModel()), PointSTEDGeometry(Grid(*SHAPE)),
        key=jax.random.key(0)).image
    assert np.isfinite(np.asarray(img)).all()


def test_interference_stripe_polarization_physics():
    """p-polarized two-beam interference fills the stripe nulls by
    (1-v)/(1+v) -- the line-STED analog of the counter-handed donut --
    and measurably broadens the line system kernel; s-polarization
    matches the default sin^2 stripe."""
    from rescan_line_sted_tpu.algorithms.metrics import fwhm_2d
    from rescan_line_sted_tpu.imaging.analytic import line_system_kernel
    from rescan_line_sted_tpu.physics.models import InterferenceStripeModel

    period = 8.0
    p_base = LineSTEDParams.create(stripe_period=period)
    s_dep = np.asarray(InterferenceStripeModel(polarization="s")
                       .depletion(64, p_base))
    np.testing.assert_allclose(
        s_dep, np.asarray(psfs.stripe_depletion_profile(64, period)),
        atol=1e-6)
    p_dep = np.asarray(InterferenceStripeModel(
        polarization="p", wavelength_px=4.0).depletion(64, p_base))
    sin_th = 4.0 / (2.0 * period)
    v = abs(1.0 - 2.0 * sin_th**2)
    assert abs(p_dep[32] - (1 - v) / (1 + v)) < 1e-6   # filled null
    assert abs(p_dep.max() - 1.0) < 1e-6
    # the filled null costs resolution through the full engine
    kern = jax.jit(lambda p: line_system_kernel((64, 64), p))
    f = {}
    for pol in ("s", "p"):
        p8 = LineSTEDParams.create(
            depletion=8.0, stripe_period=period,
            model=InterferenceStripeModel(polarization=pol))
        f[pol] = float(fwhm_2d(kern(p8))[1])
    assert f["s"] < f["p"]


def test_model_error_surfaces():
    import pytest

    from rescan_line_sted_tpu.physics.models import (
        InterferenceStripeModel,
        VectorialDonutModel,
    )

    p = PointSTEDParams.create()
    with pytest.raises(ValueError, match="polarization"):
        VectorialDonutModel(polarization="elliptical").depletion((32, 32), p)
    lp = LineSTEDParams.create()
    with pytest.raises(ValueError, match="polarization"):
        InterferenceStripeModel(polarization="d").depletion(32, lp)


def test_model_rides_vmap_and_dose():
    """The static model field survives vmap (dose sweep) and changes the
    dose ledger consistently (pupil donut has different total intensity)."""
    from rescan_line_sted_tpu.physics.dose import point_sted_dose

    geom = PointSTEDGeometry(Grid(*SHAPE))
    base = PointSTEDParams.create(depletion=2.0, model=PupilDonutModel())

    def one(s):
        return point_sted_dose(base.replace(depletion=s), geom).total_dose

    doses = jax.jit(jax.vmap(one))(jnp.asarray([0.0, 2.0, 4.0]))
    d = np.asarray(doses)
    assert np.isfinite(d).all() and (np.diff(d) > 0).all()
    # the swapped generator really changes the ledger
    d_def = float(point_sted_dose(
        PointSTEDParams.create(depletion=2.0), geom).total_dose)
    assert abs(float(d[1]) - d_def) / d_def > 1e-3
