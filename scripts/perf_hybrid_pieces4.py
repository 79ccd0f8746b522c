"""Mitigations for the pallas-output -> XLA FFT slowdown (~36 ms/img).

Variants: explicit pad before rfft; elementwise copy before rfft;
rfft as a precomputed real-DFT MXU matmul (also folds zero-padding)."""

import os
import sys
import time

sys.path.insert(0, ".")

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rescan_line_sted_tpu.config import LineSTEDParams  # noqa: E402
from rescan_line_sted_tpu.data import samples  # noqa: E402
from rescan_line_sted_tpu.imaging.line_sted import effective_line_profile  # noqa: E402
from rescan_line_sted_tpu.imaging.shifts import shifted_profiles  # noqa: E402
from rescan_line_sted_tpu.kernels import fftconv  # noqa: E402
from rescan_line_sted_tpu.kernels.poisson_pallas import (  # noqa: E402
    poisson_rows_tiered,
)
from rescan_line_sted_tpu.physics import psf as psfs  # noqa: E402

SIZE = 512
CHUNK = 32
R = 2.0
WC = int(round(R * SIZE))
K = WC // 2 + 1
P = jax.lax.Precision.HIGHEST

params = LineSTEDParams.create(depletion=8.0, sigma_exc=3.0, sigma_det=3.0,
                               stripe_period=12.0, slit_halfwidth=4.0,
                               brightness=1.0)
sample = jax.jit(lambda: samples.siemens_star((SIZE, SIZE)))()

kk = np.arange(K, dtype=np.float64)
offs = (R - 1.0) * np.arange(SIZE)
ph = np.exp(-2j * np.pi * kk[None, :] * offs[:, None] / WC)
PH = (jnp.asarray(ph.real.astype(np.float32)),
      jnp.asarray(ph.imag.astype(np.float32)))
# real-DFT factor matrices: spec = frames @ (Dre + i Dim), frames zero-padded
# to WC implicitly (only the first SIZE rows of the DFT matrix are kept)
xx = np.arange(SIZE, dtype=np.float64)
ang = -2 * np.pi * xx[:, None] * kk[None, :] / WC
DRE = jnp.asarray(np.cos(ang).astype(np.float32))   # [SIZE, K]
DIM = jnp.asarray(np.sin(ang).astype(np.float32))


def make_engine(mode):
    n_chunks = SIZE // CHUNK

    def engine(s, key):
        eff = effective_line_profile(SIZE, params)
        otf_y = fftconv.profile_to_otf1d(
            psfs.detection_profile(SIZE, params.sigma_det))
        gx_mat = fftconv.circulant_matrix(
            psfs.detection_profile(SIZE, params.sigma_det))
        sample_y = fftconv.convolve_otf1d(s, otf_y, axis=-2, n=SIZE)
        sample_t = sample_y.T
        gx_t = gx_mat.T
        positions = jnp.arange(SIZE).reshape(n_chunks, CHUNK)
        keys = jax.random.split(key, n_chunks)

        def body(canvas, chunk_in):
            pos, k = chunk_in
            ill = shifted_profiles(eff, pos)
            ph_c = jax.lax.complex(PH[0][pos], PH[1][pos])
            emitted_t = ill[:, :, None] * sample_t[None]
            cam_t = jnp.einsum("xa,cah->cxh", gx_t, emitted_t,
                               preferred_element_type=jnp.float32,
                               precision=P)
            frames_t = poisson_rows_tiered(k, cam_t)
            if mode == "dftmm":
                # spec[c, k, h] = sum_x frames_t[c, x, h] D[x, k]
                sre = jnp.einsum("cxh,xk->ckh", frames_t, DRE,
                                 preferred_element_type=jnp.float32,
                                 precision=P)
                sim = jnp.einsum("cxh,xk->ckh", frames_t, DIM,
                                 preferred_element_type=jnp.float32,
                                 precision=P)
                spec = jax.lax.complex(sre, sim)
                add = jnp.einsum("ckh,ck->kh", spec, ph_c, precision=P)
                return canvas + add, None
            frames = jnp.swapaxes(frames_t, -1, -2)          # [C, H, W]
            if mode == "pad":
                padded = jnp.pad(frames, ((0, 0), (0, 0), (0, WC - SIZE)))
                spec = jnp.fft.rfft(padded, axis=-1)
            elif mode == "copy":
                frames = frames * jnp.float32(1.0)
                spec = jnp.fft.rfft(frames, n=WC, axis=-1)
            else:
                spec = jnp.fft.rfft(frames, n=WC, axis=-1)
            add = jnp.einsum("chk,ck->hk", spec, ph_c, precision=P)
            return canvas + add, None

        shape = (K, SIZE) if mode == "dftmm" else (SIZE, K)
        canvas, _ = jax.lax.scan(body, jnp.zeros(shape, jnp.complex64),
                                 (positions, keys))
        if mode == "dftmm":
            return jnp.fft.irfft(canvas, n=WC, axis=0).T
        return jnp.fft.irfft(canvas, n=WC, axis=-1)

    return engine


def amortized(fn, n=8, seed_off=0):
    def many(s, keys):
        def body(acc, k):
            return acc + fn(s, k), None
        out, _ = jax.lax.scan(body, jnp.zeros((SIZE, WC), jnp.float32), keys)
        return out

    f = jax.jit(many)
    jax.block_until_ready(
        f(sample, jax.random.split(jax.random.key(RUN_SEED + seed_off), n)))
    best = 1e9
    for r in range(2):
        keys = jax.random.split(
            jax.random.key(RUN_SEED + seed_off + 1 + r), n)
        t0 = time.perf_counter()
        jax.block_until_ready(f(sample, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


ref = None
for i, mode in enumerate(["plain", "pad", "copy", "dftmm"]):
    eng = make_engine(mode)
    dt = amortized(eng, seed_off=100 * i)
    out = jax.jit(eng)(sample, jax.random.key(42))
    if ref is None:
        ref = np.asarray(out)
        agree = 0.0
    else:
        agree = float(np.abs(np.asarray(out) - ref).max() / np.abs(ref).max())
    print(f"{mode:8s} {dt * 1e3:8.2f} ms/img  {SIZE / dt:9.0f} steps/s  "
          f"max-rel-vs-plain {agree:.2e}")
