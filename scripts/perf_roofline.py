"""Roofline accounting for the rescan per-step-noise hybrid (VERDICT r2 #1).

Measures, at 512^2 / R=2 / b=1 (amortized, fresh keys -- see
docs/PERFORMANCE.md "Measurement methodology"), a ladder of truncated
engines that share the full engine's layout and chunking:

  conv      x-convolution matmul only ([W,W] x [W,H] per position)
  conv+samp + tiered hardware-PRNG sampling of each frame
  full      + rDFT MXU matmuls + phase placement + final irfft
            (identical math to rescanned_line_sted_image per_step)

The ladder differences isolate each stage's marginal cost; the script also
prints the algebraic MXU floor for the matmul stages (logical MACs x
precision passes / peak bf16 FLOPs) and the minimal HBM traffic of the
conv->sampler hop, giving the roofline table in docs/PERFORMANCE.md.
"""

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
P_CONV = jax.lax.Precision.HIGHEST
P_PLACE = jax.lax.Precision.HIGH

params = LineSTEDParams.create(depletion=8.0, sigma_exc=3.0, sigma_det=3.0,
                               stripe_period=12.0, brightness=1.0)
sample = jax.jit(lambda: samples.siemens_star((SIZE, SIZE)))()

kk = np.arange(K, dtype=np.float64)
offs = np.round((R - 1.0) * np.arange(SIZE))
ph = np.exp(-2j * np.pi * kk[None, :] * offs[:, None] / WC)
PH = (jnp.asarray(ph.real.astype(np.float32)),
      jnp.asarray(ph.imag.astype(np.float32)))
xx = np.arange(SIZE, dtype=np.float64)
ang = -2 * np.pi * xx[:, None] * kk[None, :] / WC
DRE = jnp.asarray(np.cos(ang).astype(np.float32))
DIM = jnp.asarray(np.sin(ang).astype(np.float32))


def make(mode):
    n_chunks = SIZE // CHUNK

    def engine(s, key):
        eff = effective_line_profile(SIZE, params)
        otf_y = fftconv.profile_to_otf1d(
            psfs.detection_profile(SIZE, params.sigma_det))
        gx_t = fftconv.circulant_matrix(
            psfs.detection_profile(SIZE, params.sigma_det)).T
        sample_t = fftconv.convolve_otf1d(s, otf_y, axis=-2, n=SIZE).T
        positions = jnp.arange(SIZE).reshape(n_chunks, CHUNK)
        keys = jax.random.split(key, n_chunks)

        def body(carry, chunk_in):
            pos, k = chunk_in
            ill = shifted_profiles(eff, pos)
            emitted_t = ill[:, :, None] * sample_t[None]
            cam_t = jnp.einsum("xa,cah->cxh", gx_t, emitted_t,
                               preferred_element_type=jnp.float32,
                               precision=P_CONV)
            if mode == "conv":
                return carry + cam_t.sum((0, 1)), None
            frames_t = poisson_rows_tiered(k, cam_t)
            if mode == "conv+samp":
                return carry + frames_t.sum((0, 1)), None
            sre = jnp.einsum("cxh,xk->ckh", frames_t, DRE,
                             preferred_element_type=jnp.float32,
                             precision=P_PLACE)
            sim = jnp.einsum("cxh,xk->ckh", frames_t, DIM,
                             preferred_element_type=jnp.float32,
                             precision=P_PLACE)
            spec = jax.lax.complex(sre, sim)
            ph_c = jax.lax.complex(PH[0][pos], PH[1][pos])
            add = jnp.einsum("ckh,ck->kh", spec, ph_c, precision=P_PLACE)
            return carry + add, None

        shape = (K, SIZE) if mode == "full" else (SIZE,)
        dtype = jnp.complex64 if mode == "full" else jnp.float32
        out, _ = jax.lax.scan(body, jnp.zeros(shape, dtype),
                              (positions, keys))
        if mode == "full":
            return jnp.fft.irfft(out, n=WC, axis=0).T
        return out

    return engine


def amortized(fn, out_shape, n=8, seed_off=0):
    def many(s, keys):
        def body(acc, k):
            r = fn(s, k)
            return acc + (r if r.ndim == len(out_shape) else r), None
        out, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32), keys)
        return out

    f = jax.jit(many)
    jax.block_until_ready(
        f(sample, jax.random.split(jax.random.key(RUN_SEED + seed_off), n)))
    best = 1e9
    for r in range(3):
        keys = jax.random.split(
            jax.random.key(RUN_SEED + seed_off + 1 + r), n)
        t0 = time.perf_counter()
        jax.block_until_ready(f(sample, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


results = {}
for i, mode in enumerate(["conv", "conv+samp", "full"]):
    shape = (SIZE, WC) if mode == "full" else (SIZE,)
    dt = amortized(make(mode), shape, seed_off=100 * i)
    results[mode] = dt
    print(f"{mode:10s} {dt * 1e3:8.2f} ms/img  {SIZE / dt:9.0f} steps/s")

print(f"\nmarginal sampler   {1e3 * (results['conv+samp'] - results['conv']):6.2f} ms")
print(f"marginal placement {1e3 * (results['full'] - results['conv+samp']):6.2f} ms")

# ---- algebraic floors (v5e: 197 TFLOP/s bf16 MXU, 819 GB/s HBM) ----------
PEAK = 197e12
BW = 819e9
conv_macs = SIZE * SIZE * SIZE * SIZE          # W^2 H per position x W pos
conv_passes = 6                                # HIGHEST = bf16x6
dft_macs = 2 * SIZE * K * SIZE * SIZE          # 2 (re+im) W K H x W pos
dft_passes = 3                                 # HIGH = bf16x3
conv_floor = 2 * conv_macs * conv_passes / PEAK
dft_floor = 2 * dft_macs * dft_passes / PEAK
hop_bytes = 2 * SIZE * SIZE * SIZE * 4         # cam_t write + read per image
hop_floor = hop_bytes / BW
print(f"\nMXU floor conv (HIGHEST x6): {conv_floor * 1e3:6.2f} ms")
print(f"MXU floor DFT  (HIGH x3):    {dft_floor * 1e3:6.2f} ms")
print(f"HBM floor conv->sampler hop: {hop_floor * 1e3:6.2f} ms")
print(f"composite floor: {(conv_floor + dft_floor + hop_floor) * 1e3:6.2f} ms "
      f"+ sampler (VPU)")
