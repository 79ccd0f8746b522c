"""Banded fused rescan megakernel vs a direct dense oracle.

The oracle builds each scan position's full camera frame from first
principles (illuminate, x-convolve with the full circulant, re-bin) and
scatter-places it with circular wrap via integer offsets into per-class
canvases -- no windows, no Pallas. Interpret mode checks the banded
kernel's conv windows, wrap split, class folding, and binning exactly;
the in-kernel Poisson draw is hardware-PRNG-only and is exercised by the
TPU statistics test below (skipped off-TPU, like test_fused_noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rescan_line_sted_tpu.kernels.rescan_banded_fused import (
    rescan_banded_fused,
)

jax.config.update("jax_enable_x64", False)


def _profile(w, sigma, rng=None):
    x = np.arange(w) - w // 2
    p = np.exp(-0.5 * (x / sigma) ** 2).astype(np.float32)
    return jnp.asarray(p)


def _dense_oracle(sample_y, eff, gx_mat, int_offsets, classes, q, wc, b):
    """Loop-based full-frame reference: per position, camera frame ->
    re-bin -> circular scatter into its class canvas."""
    h, w = sample_y.shape
    hb, wb = h // b, w // b
    sy = np.asarray(sample_y, np.float64)
    ef = np.asarray(eff, np.float64)
    gx = np.asarray(gx_mat, np.float64)
    canvases = np.zeros((q, wc, hb))
    for pos in range(w):
        ill = np.roll(ef, pos - w // 2)                      # peak at pos
        cam = (sy * ill[None, :]) @ gx                       # [H, W]
        reb = cam.reshape(hb, b, wb, b).sum(axis=(1, 3))     # [H/b, W/b]
        cols = (np.arange(wb) + int_offsets[pos]) % wc
        canvases[classes[pos], cols] += reb.T
    return canvases


@pytest.mark.parametrize("q,binning,rf", [(1, 1, 2.0), (1, 2, 3.0),
                                          (2, 1, 1.5), (4, 1, 2.25)])
def test_banded_fused_matches_dense_oracle(q, binning, rf):
    rng = np.random.default_rng(5 + q + binning)
    h = w = 64
    b = binning
    wb = w // b
    wc = int(round(rf * wb))
    sample = jnp.asarray(rng.random((h, w)), jnp.float32)
    eff = _profile(w, 1.6)
    gxp = np.asarray(_profile(w, 1.4))
    gx_mat = np.stack([np.roll(gxp, a - w // 2) for a in range(w)])

    # rational step (rf - 1)/b = p/q exactly for these params
    step = (rf - 1.0) / b
    p_n = int(round(step * q))
    assert abs(step * q - p_n) < 1e-12
    pos = np.arange(w)
    int_offsets = (p_n * pos) // q
    classes = pos % q

    chunk, d_in, d_out = 8, 32, 48 // b * b  # window > supports, < w
    got = rescan_banded_fused(
        sample, eff, jnp.asarray(gxp), jnp.asarray(int_offsets, jnp.int32),
        wc=wc, d_in=d_in, d_out=d_out, chunk=chunk, binning=b,
        classes=jnp.asarray(classes, jnp.int32), q=q, interpret=True)

    want = _dense_oracle(sample, eff, gx_mat, int_offsets, classes, q, wc, b)
    # the band truncates < 4e-10 of the illumination envelope; at sigma
    # 1.6 and window half-width (d_in - chunk)/2 = 12 the truncation is
    # ~exp(-0.5 * (12/1.6)^2) ~ 6e-13 of peak -- far below f32 matmul noise
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                               atol=2e-5 * float(np.max(want)))


def test_lane_and_sub_row_policies_match(monkeypatch):
    """The r4 lane-tile / sampler-sub-row retune is pure scheduling: every
    (RLS_BANDED_LANE, RLS_BANDED_SUB_ROWS) choice must produce the same
    noise-free canvas up to f32 accumulation order (the lane axis only
    tiles H -- retiling can reassociate the matmul's f32 sums -- and
    sub-rows only regroup tier decisions, which noise-free paths never
    take). Hardware parity at the shipping widths is asserted in
    scripts/perf_roofline_2048.py --matrix (2.9e-6 vs the exact engine
    at every cell)."""
    rng = np.random.default_rng(11)
    h = w = 64
    wc = 96
    sample = jnp.asarray(rng.random((h, w)), jnp.float32)
    eff = _profile(w, 1.6)
    gxp = _profile(w, 1.4)
    offs = jnp.asarray((np.arange(w) // 2), jnp.int32)

    def run():
        return np.asarray(rescan_banded_fused(
            sample, eff, gxp, offs, wc=wc, d_in=32, d_out=48, chunk=8,
            interpret=True))

    base = run()
    scale = float(np.abs(base).max())
    for lane, sub in [(32, 32), (64, 32), (32, 128), (64, 128)]:
        # chunk*dob = 8*48 = 384, a multiple of both sub choices
        monkeypatch.setenv("RLS_BANDED_LANE", str(lane))
        monkeypatch.setenv("RLS_BANDED_SUB_ROWS", str(sub))
        np.testing.assert_allclose(run(), base, rtol=1e-5,
                                   atol=1e-5 * scale,
                                   err_msg=f"{lane}/{sub}")
    monkeypatch.delenv("RLS_BANDED_LANE")
    monkeypatch.delenv("RLS_BANDED_SUB_ROWS")


def test_banded_fused_guards():
    h = w = 64
    sample = jnp.zeros((h, w), jnp.float32)
    eff = _profile(w, 1.5)
    gx = _profile(w, 1.5)
    offs = jnp.zeros((w,), jnp.int32)
    with pytest.raises(ValueError, match="frame window"):
        rescan_banded_fused(sample, eff, gx, offs, wc=128, d_in=32,
                            d_out=None, chunk=8, interpret=True)
    with pytest.raises(ValueError, match="multiple of 8"):
        rescan_banded_fused(sample, eff, gx, offs, wc=128, d_in=32,
                            d_out=48, chunk=4, interpret=True)
    with pytest.raises(ValueError, match="wider than canvas"):
        rescan_banded_fused(sample, eff, gx, offs, wc=32, d_in=32,
                            d_out=48, chunk=8, interpret=True)
    with pytest.raises(ValueError, match="binning"):
        rescan_banded_fused(sample, eff, gx, offs, wc=128, d_in=32,
                            d_out=50, chunk=8, binning=2, interpret=True)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel PRNG draws need TPU hardware")
def test_banded_fused_noise_statistics():
    """Noisy canvas: mean consistent with the noise-free canvas, variance
    Poisson-like (the placement is a fixed linear map of iid counts)."""
    rng = np.random.default_rng(11)
    h = w = 128
    wc = 2 * w
    sample = jnp.asarray(50.0 * rng.random((h, w)), jnp.float32)
    eff = 40.0 * _profile(w, 1.6)
    gxp = _profile(w, 1.4)
    offs = jnp.asarray(np.arange(w), jnp.int32)
    kw = dict(wc=wc, d_in=64, d_out=96, chunk=16, interpret=False)
    clean = rescan_banded_fused(sample, eff, gxp, offs, **kw)
    noisy = rescan_banded_fused(sample, eff, gxp, offs,
                                seed=jnp.asarray([7, 9], jnp.int32), **kw)
    s_clean = float(jnp.sum(clean))
    s_noisy = float(jnp.sum(noisy))
    assert abs(s_noisy - s_clean) < 5.0 * np.sqrt(s_clean)
    # determinism in the seed
    noisy2 = rescan_banded_fused(sample, eff, gxp, offs,
                                 seed=jnp.asarray([7, 9], jnp.int32), **kw)
    np.testing.assert_array_equal(np.asarray(noisy), np.asarray(noisy2))
    # different seed decorrelates
    noisy3 = rescan_banded_fused(sample, eff, gxp, offs,
                                 seed=jnp.asarray([8, 9], jnp.int32), **kw)
    assert float(jnp.max(jnp.abs(noisy3 - noisy))) > 0.0


class TestEngineRoute:
    """use_pallas=True routes rounded placements onto the banded fused
    kernel whenever the static band windows exist, with parity against the
    XLA scatter engine."""

    def _setup(self, binning=1):
        from rescan_line_sted_tpu.config import (Grid, RescanGeometry,
                                                 RescanParams)
        from rescan_line_sted_tpu.data import samples

        h, w = 64, 256
        # keep the offset step (R - 1)/binning integral so reassignment
        # auto-selects "rounded" (the banded fused route)
        geom = RescanGeometry(Grid(h, w), rescan_factor=binning + 1.0,
                              binning=binning, chunk=16)
        params = RescanParams.create(sigma_exc=2.0, sigma_det=2.0,
                                     stripe_period=8.0, depletion=4.0,
                                     brightness=40.0)
        return samples.rings((h, w), period=12.0), params, geom

    @pytest.mark.parametrize("binning", [1, 2])
    def test_banded_engine_parity(self, binning, monkeypatch):
        import rescan_line_sted_tpu.imaging.rescan as rmod
        from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
        from rescan_line_sted_tpu.kernels import rescan_banded_fused as kmod

        sample, params, geom = self._setup(binning)
        calls = []
        orig = kmod.rescan_banded_fused

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(kmod, "rescan_banded_fused", spy)
        want = rescanned_line_sted_image(sample, params, geom, method="scan",
                                         use_pallas=False).image
        got = rescanned_line_sted_image(sample, params, geom, method="scan",
                                        use_pallas=True).image
        assert calls, "banded fused kernel was not routed"
        err = float(np.linalg.norm(np.asarray(got) - np.asarray(want))
                    / np.linalg.norm(np.asarray(want)))
        assert err < 2e-6

    @pytest.mark.parametrize("rf,q", [(1.5, 2), (2.25, 4)])
    def test_banded_rational_subpixel_parity(self, rf, q, monkeypatch):
        """Rational subpixel steps (R-1)/b = p/q route onto the banded
        fused kernel with q fractional-offset classes; the folded class
        canvases + per-class spectral residues must match the exact
        per-position phase-ramp engine."""
        from rescan_line_sted_tpu.config import (Grid, RescanGeometry,
                                                 RescanParams)
        from rescan_line_sted_tpu.data import samples
        from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
        from rescan_line_sted_tpu.kernels import rescan_banded_fused as kmod

        h, w = 64, 256
        geom = RescanGeometry(Grid(h, w), rescan_factor=rf, binning=1,
                              chunk=16)
        params = RescanParams.create(sigma_exc=2.0, sigma_det=2.0,
                                     stripe_period=8.0, depletion=4.0,
                                     brightness=40.0)
        sample = samples.rings((h, w), period=12.0)
        calls = []
        orig = kmod.rescan_banded_fused

        def spy(*a, **k):
            calls.append(k.get("q"))
            return orig(*a, **k)

        monkeypatch.setattr(kmod, "rescan_banded_fused", spy)
        want = rescanned_line_sted_image(sample, params, geom, method="scan",
                                         use_pallas=False).image
        got = rescanned_line_sted_image(sample, params, geom, method="scan",
                                        use_pallas=True).image
        assert calls == [q], "banded fused kernel not routed with q classes"
        err = float(np.linalg.norm(np.asarray(got) - np.asarray(want))
                    / np.linalg.norm(np.asarray(want)))
        assert err < 1e-5

    def test_env_kill_switch_routes_megakernel(self, monkeypatch):
        from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
        from rescan_line_sted_tpu.kernels import rescan_banded_fused as kmod

        sample, params, geom = self._setup()
        monkeypatch.setenv("RLS_BANDED_FUSED", "0")

        def boom(*a, **k):
            raise AssertionError("banded kernel must be disabled")

        monkeypatch.setattr(kmod, "rescan_banded_fused", boom)
        img = rescanned_line_sted_image(sample, params, geom, method="scan",
                                        use_pallas=True).image
        assert np.isfinite(np.asarray(img)).all()
