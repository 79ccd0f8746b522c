"""Padded-boundary acquisition: circular-wrap seams disappear."""

import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.imaging import line_sted_image
from rescan_line_sted_tpu.imaging.boundary import acquire_padded


PARAMS = LineSTEDParams.create(sigma_exc=2.0, sigma_det=2.0, stripe_period=8.0,
                               depletion=4.0, slit_halfwidth=2.5,
                               brightness=10.0)


def test_padded_acquisition_kills_wrap():
    """A bright edge column leaks to the opposite edge circularly, but not
    with padded boundaries."""
    shape = (32, 32)
    sample = jnp.zeros(shape).at[:, 0].set(1.0)  # content ON the x edge
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)

    circ = np.asarray(line_sted_image(sample, PARAMS, geom).image)
    padded = np.asarray(acquire_padded(
        lambda s, g, **kw: line_sted_image(s, PARAMS, g, **kw),
        sample, geom, margin=16).image)

    # circular: signal wraps to the far edge; padded: it does not
    assert circ[:, -1].mean() > 1e6 * max(padded[:, -1].mean(), 1e-9)
    # where the signal actually lives, away from BOTH wrap axes (the line
    # also wraps in y circularly: padded edge rows legitimately dim), both
    # boundary modes agree
    err = np.linalg.norm(circ[8:24, :10] - padded[8:24, :10]) / \
        np.linalg.norm(circ[8:24, :10])
    assert err < 1e-3
    # open boundary: the line's ends dim instead of wrapping around in y
    assert padded[0, 0] < 0.7 * padded[16, 0]
    assert abs(circ[0, 0] - circ[16, 0]) < 1e-3 * circ[16, 0]


def test_padded_rescan_shapes():
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    shape = (32, 32)
    sample = jnp.zeros(shape).at[16, 16].set(1.0)
    geom = RescanGeometry(Grid(*shape), rescan_factor=2.0, chunk=16)
    res = acquire_padded(
        lambda s, g, **kw: rescanned_line_sted_image(s, PARAMS, g, **kw),
        sample, geom, margin=16)
    assert res.image.shape == (32, 64)
    canvas = np.asarray(res.image)
    peak = np.unravel_index(canvas.argmax(), canvas.shape)
    assert abs(peak[1] - 32) <= 1  # point at x=16 -> canvas column ~R*16


def test_acquire_padded_rejects_binning_misaligned_margin():
    import pytest

    from rescan_line_sted_tpu.config import RescanParams
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    shape = (32, 32)
    sample = jnp.zeros(shape).at[16, 16].set(1.0)
    geom = RescanGeometry(Grid(*shape), rescan_factor=2.0, binning=2,
                          chunk=16)
    params = RescanParams.create(brightness=10.0)
    with pytest.raises(ValueError, match="margin"):
        acquire_padded(
            lambda s, g, **kw: rescanned_line_sted_image(
                s, params, g, method="scan", **kw),
            sample, geom, margin=15)


def test_padded_rescan_fractional_margin_subpixel_crop():
    """Irrational/non-integral R*margin: acquire_padded shifts the canvas
    band-limitedly before cropping, so any margin (divisible by binning)
    lands exactly on the original field (ROADMAP r2 item 6)."""
    from rescan_line_sted_tpu.config import RescanParams
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    shape = (32, 32)
    sample = jnp.zeros(shape).at[14:18, 14:18].set(1.0)  # interior content
    r = 1.625  # 13/8: margin=16 -> R*m=26 integral; margin=10 -> 16.25
    params = RescanParams.create(sigma_exc=2.0, sigma_det=2.0,
                                 stripe_period=8.0, depletion=4.0,
                                 brightness=10.0)
    geom = RescanGeometry(Grid(*shape), rescan_factor=r, chunk=16)
    eng = lambda s, g, **kw: rescanned_line_sted_image(  # noqa: E731
        s, params, g, **kw)
    exact = np.asarray(acquire_padded(eng, sample, geom, margin=16).image)
    frac = np.asarray(acquire_padded(eng, sample, geom, margin=10).image)
    assert exact.shape == frac.shape == geom.canvas_shape
    # same field, same placement: agree wherever there is signal
    sel = exact > exact.max() * 1e-3
    rel = np.abs(exact - frac)[sel].max() / exact.max()
    assert rel < 2e-3, rel
    assert np.unravel_index(exact.argmax(), exact.shape) == \
        np.unravel_index(frac.argmax(), frac.shape)
    # the crop indices are static host math: the same call must trace
    import jax
    under_jit = np.asarray(jax.jit(
        lambda s: acquire_padded(eng, s, geom, margin=10).image)(sample))
    np.testing.assert_allclose(under_jit, frac, atol=1e-5 * exact.max())


def test_engine_boundary_option():
    """boundary="padded" on the engine API equals acquire_padded directly,
    and kills the circular wrap (VERDICT r1 item 7 / ROADMAP 3)."""
    shape = (32, 32)
    sample = jnp.zeros(shape).at[:, 0].set(1.0)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)

    via_flag = np.asarray(line_sted_image(sample, PARAMS, geom,
                                          boundary="padded",
                                          margin=16).image)
    via_helper = np.asarray(acquire_padded(
        lambda s, g, **kw: line_sted_image(s, PARAMS, g, **kw),
        sample, geom, margin=16).image)
    np.testing.assert_allclose(via_flag, via_helper, rtol=1e-6)

    circ = np.asarray(line_sted_image(sample, PARAMS, geom).image)
    assert circ[:, -1].mean() > 1e6 * max(via_flag[:, -1].mean(), 1e-9)
    # dose is reported for the requested (unpadded) field
    res = line_sted_image(sample, PARAMS, geom, boundary="padded", margin=16)
    assert float(res.dose.num_steps) == shape[1]


def test_rescan_engine_boundary_option():
    from rescan_line_sted_tpu.config import RescanParams
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    shape = (32, 32)
    sample = jnp.zeros(shape).at[16, 0].set(1.0)  # emitter ON the x edge
    geom = RescanGeometry(Grid(*shape), rescan_factor=2.0, chunk=16)
    params = RescanParams.create(sigma_exc=2.0, sigma_det=2.0,
                                 stripe_period=8.0, depletion=4.0,
                                 brightness=100.0)
    circ = np.asarray(rescanned_line_sted_image(
        sample, params, geom, method="scan").image)
    padded = np.asarray(rescanned_line_sted_image(
        sample, params, geom, method="scan", boundary="padded",
        margin=16).image)
    assert padded.shape == geom.canvas_shape
    # circular: the edge emitter wraps to the far canvas edge; padded: not
    assert circ[:, -3:].sum() > 1e5 * max(padded[:, -3:].sum(), 1e-12)


def test_point_engine_boundary_option():
    from rescan_line_sted_tpu.config import PointSTEDGeometry, PointSTEDParams
    from rescan_line_sted_tpu.imaging import point_sted_image

    shape = (32, 32)
    sample = jnp.zeros(shape).at[0, 16].set(1.0)  # emitter ON the y edge
    geom = PointSTEDGeometry(Grid(*shape), chunk=32)
    params = PointSTEDParams.create(brightness=100.0)
    circ = np.asarray(point_sted_image(sample, params, geom).image)
    padded = np.asarray(point_sted_image(sample, params, geom,
                                         boundary="padded", margin=16).image)
    assert padded.shape == shape
    assert circ[-3:, :].sum() > 1e5 * max(padded[-3:, :].sum(), 1e-12)


def test_apodized_boundary_kills_wrap():
    """boundary="apodized": edge content is tapered away, so nothing wraps;
    interior content is imaged identically (ROADMAP 3 remainder)."""
    shape = (48, 48)
    interior = jnp.zeros(shape).at[20:28, 20:28].set(1.0)
    edge = interior.at[:, 0].set(1.0)
    geom = LineSTEDGeometry(Grid(*shape), chunk=16)

    circ = np.asarray(line_sted_image(edge, PARAMS, geom).image)
    apod = np.asarray(line_sted_image(edge, PARAMS, geom,
                                      boundary="apodized", margin=8).image)
    # circular: the edge column wraps to the far side; apodized: it is gone
    assert circ[:, -1].mean() > 1e5 * max(apod[:, -1].mean(), 1e-12)
    # the interior is imaged as if the edge content weren't there
    interior_only = np.asarray(line_sted_image(interior, PARAMS, geom).image)
    np.testing.assert_allclose(apod[16:32, 16:32],
                               interior_only[16:32, 16:32], rtol=1e-4)


def test_apodize_margin_zero_is_identity():
    from rescan_line_sted_tpu.imaging.boundary import apodize_sample

    s = jnp.ones((16, 16))
    np.testing.assert_array_equal(np.asarray(apodize_sample(s, 0)),
                                  np.asarray(s))
    import pytest
    with pytest.raises(ValueError, match="margin"):
        apodize_sample(s, -1)
