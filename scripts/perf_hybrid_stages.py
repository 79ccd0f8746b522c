"""Stage-level profile of the per-step hybrid rescan path (one script).

Consolidates the r3 exploration harnesses perf_hybrid_pieces{,2,3,4}.py
into one parameterized engine factory; every number in
docs/PERFORMANCE.md "Per-step-noise hybrid engine" maps to a variant here:

  --variant ladder   stage-disable ladder (which stage costs what)
  --variant layout   conv/sampler layout variants (W-major tiered vs
                     natural flat; rfft axis; 128-col tier blocks)
  --variant bisect   downstream bisect: which stage, fed by the Pallas
                     sampler's output, pays the ~30 ms (pad-only / +fft /
                     +phase einsum)
  --variant dft      mitigations for the pallas-output -> XLA FFT slowdown
                     (explicit pad, elementwise copy, rDFT as MXU matmuls)
                     with parity vs the plain path

TPU; amortized lax.scan methodology as in bench.py (N engine calls folded
into ONE jitted scan, fresh os.urandom-derived keys per timed call --
isolated microbenchmarks return dispatch-only walls through the tunnel).
"""

import argparse
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
    poisson_pallas,
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
# real-DFT factor matrices: spec = frames @ (Dre + i Dim); zero-padding to
# WC is folded in by keeping only the first SIZE rows of the DFT matrix
xx = np.arange(SIZE, dtype=np.float64)
ang = -2 * np.pi * xx[:, None] * kk[None, :] / WC
DRE = jnp.asarray(np.cos(ang).astype(np.float32))   # [SIZE, K]
DIM = jnp.asarray(np.sin(ang).astype(np.float32))

SAMPLERS = {
    "tiered": poisson_rows_tiered,
    "flat": poisson_pallas,
    "identity": lambda k, x, **kw: x,
    "natcol": lambda k, x: poisson_rows_tiered(k, x, block_cols=128),
}


def make_engine(conv_layout="transposed", sampler="tiered",
                placement="full"):
    """One per-step hybrid engine with any stage swapped or disabled.

    conv_layout: 'transposed' (W-major, stripe spans rows: tier-friendly)
                 or 'natural'.
    sampler:     key into SAMPLERS.
    placement:   'full'   rfft + phase einsum (the engine's real epilogue)
                 'ax2'    like full but rfft(axis=-2) on the transposed
                          frames, no swapaxes (transposed layout only)
                 'dftmm'  rDFT as two MXU matmuls (the shipped mitigation)
                 'padfft' explicit jnp.pad then rfft (mitigation probe)
                 'copy'   elementwise copy then rfft (mitigation probe)
                 'fftsum' rfft, skip the phase einsum (bisect probe)
                 'padsum' pad + sum only, no FFT at all (bisect probe)
                 'none'   skip placement entirely (conv+sample cost)
    """
    sample_fn = SAMPLERS[sampler]
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
            if conv_layout == "transposed":
                emitted_t = ill[:, :, None] * sample_t[None]
                cam_t = jnp.einsum("xa,cah->cxh", gx_t, emitted_t,
                                   preferred_element_type=jnp.float32,
                                   precision=P)
                frames_t = sample_fn(k, cam_t)        # [C, W, H]
                if placement == "ax2":
                    spec = jnp.fft.rfft(frames_t, n=WC, axis=-2)
                    return canvas + jnp.einsum("ckh,ck->kh", spec, ph_c,
                                               precision=P), None
                if placement == "dftmm":
                    sre = jnp.einsum("cxh,xk->ckh", frames_t, DRE,
                                     preferred_element_type=jnp.float32,
                                     precision=P)
                    sim = jnp.einsum("cxh,xk->ckh", frames_t, DIM,
                                     preferred_element_type=jnp.float32,
                                     precision=P)
                    spec = jax.lax.complex(sre, sim)
                    return canvas + jnp.einsum("ckh,ck->kh", spec, ph_c,
                                               precision=P), None
                frames = jnp.swapaxes(frames_t, -1, -2)   # [C, H, W]
            else:
                emitted = ill[:, None, :] * sample_y[None]
                cam = jnp.einsum("cha,ax->chx", emitted, gx_mat,
                                 preferred_element_type=jnp.float32,
                                 precision=P)
                frames = sample_fn(k, cam)
            if placement == "none":
                return canvas + frames.sum(0)[:, :1] * jnp.ones((1, K)), None
            if placement == "padsum":
                padded = jnp.pad(frames, ((0, 0), (0, 0), (0, WC - SIZE)))
                return (canvas
                        + padded.sum(0).astype(jnp.complex64)[:, :K]), None
            if placement == "padfft":
                frames = jnp.pad(frames, ((0, 0), (0, 0), (0, WC - SIZE)))
                spec = jnp.fft.rfft(frames, axis=-1)
            elif placement == "copy":
                spec = jnp.fft.rfft(frames * jnp.float32(1.0), n=WC,
                                    axis=-1)
            else:
                spec = jnp.fft.rfft(frames, n=WC, axis=-1)   # [C, H, K]
            if placement == "fftsum":
                return canvas + spec.sum(0), None
            return canvas + jnp.einsum("chk,ck->hk", spec, ph_c,
                                       precision=P), None

        shape = (K, SIZE) if placement in ("ax2", "dftmm") else (SIZE, K)
        canvas, _ = jax.lax.scan(body, jnp.zeros(shape, jnp.complex64),
                                 (positions, keys))
        if placement in ("ax2", "dftmm"):
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


VARIANTS = {
    "ladder": [
        ("full hybrid (tiered sampler)", dict()),
        ("hybrid, sampler=identity (placement cost)",
         dict(sampler="identity")),
        ("hybrid, sampler=flat poisson_pallas", dict(sampler="flat")),
        ("natural layout + flat sampler (old path)",
         dict(conv_layout="natural", sampler="flat")),
        ("natural layout, sampler=identity",
         dict(conv_layout="natural", sampler="identity")),
        ("hybrid, no placement (conv+sample only)",
         dict(placement="none")),
        ("identity sampler, no placement (conv only)",
         dict(sampler="identity", placement="none")),
    ],
    "layout": [
        ("swap: transposed+tiered, swapaxes+rfft(-1)", dict()),
        ("ax2: transposed+tiered, rfft(-2) no swap",
         dict(placement="ax2")),
        ("natcol: natural+tiered 128-col blocks",
         dict(conv_layout="natural", sampler="natcol")),
        ("natflat: natural+flat (old path)",
         dict(conv_layout="natural", sampler="flat")),
    ],
    "bisect": [
        ("sampler + pad only (no fft)", dict(placement="padsum")),
        ("sampler + fft (no phase einsum)", dict(placement="fftsum")),
        ("sampler + fft + phase (full)", dict()),
        ("identity + fft (no phase einsum)",
         dict(sampler="identity", placement="fftsum")),
    ],
    "dft": [
        ("plain: swapaxes + rfft", dict()),
        ("padfft: explicit pad + rfft", dict(placement="padfft")),
        ("copy: elementwise copy + rfft", dict(placement="copy")),
        ("dftmm: rDFT as MXU matmuls (shipped)",
         dict(placement="dftmm")),
    ],
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", choices=sorted(VARIANTS), default="ladder")
    args = ap.parse_args()
    cases = VARIANTS[args.variant]
    check_parity = args.variant == "dft"
    ref = None
    for i, (label, kw) in enumerate(cases):
        eng = make_engine(**kw)
        dt = amortized(eng, seed_off=100 * i)
        line = f"{label:46s} {dt * 1e3:8.2f} ms/img  {SIZE / dt:9.0f} steps/s"
        if check_parity:
            out = np.asarray(jax.jit(eng)(sample, jax.random.key(42)))
            if ref is None:
                ref, agree = out, 0.0
            else:
                agree = float(np.abs(out - ref).max() / np.abs(ref).max())
            line += f"  max-rel-vs-plain {agree:.2e}"
        print(line)


if __name__ == "__main__":
    main()
