"""Tiered-sampler blocking sweep inside the full per-step hybrid engine.

Varies (block_rows, sub_rows, block_cols) of poisson_rows_tiered at the
engine level (512^2, R=1.5, per-step) -- microbenches are unreliable
through the tunnel, so the whole engine is timed."""

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
R = 1.5
WC = int(round(R * SIZE))
K = WC // 2 + 1
HI = jax.lax.Precision.HIGHEST
HIGH = jax.lax.Precision.HIGH

params = LineSTEDParams.create(depletion=8.0, sigma_exc=3.0, sigma_det=3.0,
                               stripe_period=12.0, slit_halfwidth=4.0,
                               brightness=1.0)
sample = jax.jit(lambda: samples.siemens_star((SIZE, SIZE)) * 20.0)()

kk = np.arange(K, dtype=np.float64)
offs = (R - 1.0) * np.arange(SIZE)
ph = np.exp(-2j * np.pi * kk[None, :] * offs[:, None] / WC)
PH = (jnp.asarray(ph.real.astype(np.float32)),
      jnp.asarray(ph.imag.astype(np.float32)))
xx = np.arange(SIZE, dtype=np.float64)
ang = -2 * np.pi * xx[:, None] * kk[None, :] / WC
DRE = jnp.asarray(np.cos(ang).astype(np.float32))
DIM = jnp.asarray(np.sin(ang).astype(np.float32))


def make_engine(br, sr, bc):
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
            emitted_t = ill[:, :, None] * sample_t[None]
            cam_t = jnp.einsum("xa,cah->cxh", gx_t, emitted_t,
                               preferred_element_type=jnp.float32,
                               precision=HI)
            frames_t = poisson_rows_tiered(k, cam_t, block_rows=br,
                                           sub_rows=sr, block_cols=bc)
            sre = jnp.einsum("cxh,xk->ckh", frames_t, DRE,
                             preferred_element_type=jnp.float32,
                             precision=HIGH)
            sim = jnp.einsum("cxh,xk->ckh", frames_t, DIM,
                             preferred_element_type=jnp.float32,
                             precision=HIGH)
            spec = jax.lax.complex(sre, sim)
            ph_c = jax.lax.complex(PH[0][pos], PH[1][pos])
            add = jnp.einsum("ckh,ck->kh", spec, ph_c, precision=HIGH)
            return canvas + add, None

        canvas, _ = jax.lax.scan(body, jnp.zeros((K, SIZE), jnp.complex64),
                                 (positions, keys))
        return jnp.fft.irfft(canvas, n=WC, axis=0).T

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


for i, (br, sr, bc) in enumerate([
        (32, 32, None), (16, 16, None), (64, 16, None), (8, 8, None),
        (32, 32, 256)]):
    dt = amortized(make_engine(br, sr, bc), seed_off=100 * i)
    print(f"block_rows={br:3d} sub_rows={sr:3d} block_cols={bc} "
          f"{dt * 1e3:7.2f} ms/img {SIZE / dt:9.0f} steps/s")
