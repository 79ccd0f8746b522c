"""Operator-form RL and rescanned-view fusion tests."""

import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms.fusion import (
    multi_orientation_rescan,
    rescan_fusion,
    rescan_operator,
    richardson_lucy_operator,
)
from rescan_line_sted_tpu.config import Grid, RescanGeometry, RescanParams
from rescan_line_sted_tpu.data import samples


SHAPE = (48, 48)
GEOM = RescanGeometry(Grid(*SHAPE), rescan_factor=2.0, binning=1, chunk=16)
PARAMS = RescanParams.create(sigma_exc=2.0, sigma_det=2.0, stripe_period=8.0,
                             depletion=6.0, brightness=100.0)


def _masked_sample():
    # zero x-margins so the analytic rescan model is exact (see analytic.py)
    mask = (jnp.arange(SHAPE[1]) >= 10) & (jnp.arange(SHAPE[1]) < 38)
    return samples.rings(SHAPE, period=12.0) * mask[None, :]


def test_rescan_operator_adjointness():
    """<A x, y> == <x, A^T y> for random x, y."""
    rng = np.random.default_rng(0)
    fwd, adj = rescan_operator(GEOM, PARAMS)
    x = jnp.asarray(rng.uniform(size=SHAPE), jnp.float32)
    y = jnp.asarray(rng.uniform(size=GEOM.canvas_shape), jnp.float32)
    lhs = float(jnp.vdot(fwd(x), y))
    rhs = float(jnp.vdot(x, adj(y)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-5


def test_forward_op_matches_engine():
    sample = _masked_sample()
    fwd, _ = rescan_operator(GEOM, PARAMS)
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
    want = rescanned_line_sted_image(sample, PARAMS, GEOM,
                                     method="analytic").image
    got = fwd(sample)
    err = np.linalg.norm(np.asarray(got) - np.asarray(want)) / \
        np.linalg.norm(np.asarray(want))
    assert err < 1e-6


def test_operator_rl_matches_view_rl_for_plain_convolution():
    """With identity-geometry conv ops, operator RL == kernel RL."""
    from rescan_line_sted_tpu.algorithms import richardson_lucy
    from rescan_line_sted_tpu.kernels import fftconv
    from rescan_line_sted_tpu.physics import psf as psfs
    true = samples.rings(SHAPE) + 0.05
    psf = psfs.detection_psf(SHAPE, 1.5)
    data = fftconv.fft_convolve(true, psf)
    otf = fftconv.kernel_to_otf(psf)
    ops = [(lambda e: fftconv.convolve_otf(e, otf),
            lambda y: fftconv.correlate_otf(y, otf))]
    init = jnp.full(SHAPE, jnp.mean(data))
    got = richardson_lucy_operator([data], ops, 30, init)
    want = richardson_lucy(data, psf, 30)
    err = np.linalg.norm(np.asarray(got) - np.asarray(want)) / \
        np.linalg.norm(np.asarray(want))
    assert err < 1e-4


def test_rescan_fusion_recovers_sample():
    """Noise-free two-orientation rescan fusion converges to the sample."""
    sample = _masked_sample()
    angles = [0.0, np.pi / 2]
    canvases = multi_orientation_rescan(sample, PARAMS, GEOM, angles)
    est = rescan_fusion(canvases, PARAMS, GEOM, angles, num_iter=150)
    est = np.asarray(est)
    s = np.asarray(sample)
    # compare the interior (rotation cuts corners; seams at x edges)
    sl = (slice(12, 36), slice(12, 36))
    corr = np.corrcoef(est[sl].ravel(), s[sl].ravel())[0, 1]
    assert corr > 0.95
    assert np.isfinite(est).all() and (est >= 0).all()


def test_optimal_rescan_factor():
    from rescan_line_sted_tpu.imaging.rescan import optimal_rescan_factor

    # equal widths (no depletion, sigma_exc == sigma_det) -> R ~= 2
    p_eq = RescanParams.create(sigma_exc=4.0, sigma_det=4.0, depletion=0.0)
    r_eq = float(optimal_rescan_factor(p_eq, 128))
    assert abs(r_eq - 2.0) < 0.1
    # strong STED sharpens the line -> R grows (photons collapse to x0)
    p_sted = RescanParams.create(sigma_exc=4.0, sigma_det=4.0,
                                 stripe_period=16.0, depletion=30.0)
    assert float(optimal_rescan_factor(p_sted, 128)) > 3.0


def test_rescan_operator_adjoint_exact():
    """<A x, y> == <x, A^T y> for the linear_transpose adjoint, including
    rotation, fractional R, and binning."""
    import numpy as np

    from rescan_line_sted_tpu.algorithms.fusion import rescan_operator

    geom = RescanGeometry(Grid(32, 32), rescan_factor=1.5, binning=2,
                          chunk=16)
    params = RescanParams.create(sigma_exc=2.0, sigma_det=2.0,
                                 stripe_period=8.0, depletion=4.0,
                                 brightness=20.0)
    fwd, adj = rescan_operator(geom, params, angle=0.7)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(32, 32)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=geom.canvas_shape), jnp.float32)
    lhs = float(jnp.vdot(fwd(x), y))
    rhs = float(jnp.vdot(x, adj(y)))
    assert abs(lhs - rhs) <= 1e-5 * abs(lhs)


def test_rescan_fusion_with_binning_and_fractional_R():
    """Fusion deconvolves + de-bins + de-rescans binned fractional-R views
    (ROADMAP 2 / VERDICT r1 item 2)."""
    import numpy as np

    h = w = 48
    geom = RescanGeometry(Grid(h, w), rescan_factor=1.5, binning=2, chunk=16)
    params = RescanParams.create(sigma_exc=2.0, sigma_det=2.0,
                                 stripe_period=8.0, depletion=6.0,
                                 brightness=50.0)
    sample = np.zeros((h, w), np.float32)
    sample[10:38:6, 10:38] = 1.0
    sample[10:38, 10:38:6] += 1.0
    angles = (0.0, float(jnp.pi / 2))
    canv = multi_orientation_rescan(jnp.asarray(sample), params, geom,
                                    jnp.asarray(angles))
    assert canv.shape == (2,) + geom.canvas_shape
    est = np.asarray(rescan_fusion(canv, params, geom, angles, num_iter=40))
    assert np.isfinite(est).all()
    corr = np.corrcoef(est.ravel(), sample.ravel())[0, 1]
    assert corr > 0.7


def test_operator_rl_accelerated_converges_faster():
    """Biggs-Andrews on the operator loop: fewer iterations reach the plain
    loop's restoration error (VERDICT r2 item 7)."""
    sample = _masked_sample()
    angles = [0.0, np.pi / 2]
    canvases = multi_orientation_rescan(sample, PARAMS, GEOM, angles)
    s = np.asarray(sample)
    sl = (slice(12, 36), slice(12, 36))

    def err(est):
        e = np.asarray(est)[sl] - s[sl]
        return float(np.linalg.norm(e) / np.linalg.norm(s[sl]))

    plain = rescan_fusion(canvases, PARAMS, GEOM, angles, num_iter=80)
    accel = rescan_fusion(canvases, PARAMS, GEOM, angles, num_iter=40,
                          accelerate=True)
    assert np.isfinite(np.asarray(accel)).all()
    assert (np.asarray(accel) >= 0).all()
    # half the iterations, at-least-matching restoration error (small slack
    # for the extrapolation's non-monotone steps)
    assert err(accel) <= err(plain) * 1.05


def test_practical_rescan_factor():
    from rescan_line_sted_tpu.imaging.rescan import (
        optimal_rescan_factor,
        practical_rescan_factor,
        rescan_kernel_sigma,
    )

    p_sted = RescanParams.create(sigma_exc=4.0, sigma_det=4.0,
                                 stripe_period=16.0, depletion=30.0)
    r_opt = float(optimal_rescan_factor(p_sted, 128))
    r_prac = float(practical_rescan_factor(p_sted, 128))
    # the variance curve is flat near its optimum: the practical point is
    # well below the optimum but within the 5% resolution tolerance
    assert 1.0 < r_prac < r_opt
    s_opt = float(rescan_kernel_sigma(p_sted, 128, r_opt))
    s_prac = float(rescan_kernel_sigma(p_sted, 128, r_prac))
    assert s_prac <= s_opt * 1.05 + 1e-6
    assert s_prac >= s_opt - 1e-6  # optimum really is the minimum
    # cap clamps
    assert float(practical_rescan_factor(p_sted, 128, cap=2.0)) == 2.0
    # tighter tolerance -> recommendation moves toward the optimum
    r_tight = float(practical_rescan_factor(p_sted, 128, tolerance=0.005))
    assert r_prac < r_tight <= r_opt + 1e-6
    # default snap: R - 1 is a multiple of 1/8 (routes the collapsed scan
    # onto the strip placement path) and rounds UP from the continuous
    # root -- toward the optimum, so still within tolerance
    r_cont = float(practical_rescan_factor(p_sted, 128, snap=None))
    assert abs(r_prac * 8 - round(r_prac * 8)) < 1e-5
    assert r_cont <= r_prac <= min(r_cont + 0.125, r_opt) + 1e-5
    assert float(rescan_kernel_sigma(p_sted, 128, r_prac)) \
        <= s_opt * 1.05 + 1e-6
