"""Fused rescan scan-loop megakernel.

One ``pallas_call`` executes the ENTIRE rescanned line-STED scan (collapsed
noise mode, any binning). Grid step i IS scan position i: the kernel rotates
the (brightness-scaled, depleted) excitation profile to the scan position
in-register (``pltpu.roll`` with a dynamic shift), emits
(``sample_y^T * ill``), x-convolves with the detection profile as an MXU
matmul against its circulant, and scatter-accumulates into the canvas at the
per-position rescan offset (8-aligned base + residual rotate, as in
``rescan_accumulate.py``). The y-convolved sample, the circulant, the
excitation profile, and the canvas stay **resident in VMEM for the whole
grid** -- zero HBM round-trips between scan steps, unlike the lax.scan
engine which materializes per-chunk [C, H, W] intermediates in HBM.

Everything is laid out transposed ([W, H]-major) so the dynamic-offset store
hits the sublane dimension and nothing is transposed in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rescan_line_sted_tpu.config import matmul_precision

# engine matmul precision (HIGHEST unless RLS_MATMUL_PRECISION overrides;
# see config.matmul_precision for the measured error budget)
_PRECISION = matmul_precision(pallas=True)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(offsets_ref, seed_ref, eff_col_ref, sample_yt_ref,
                  gx_mat_t_ref, *rest, w: int, w_pad: int, binned_w: int,
                  noisy: bool, n_tiles: int):
    if binned_w != w:  # detector re-binning as two more MXU matmuls
        brow_ref, bcol_ref, out_ref, frame_scratch = rest
    else:
        out_ref, frame_scratch = rest
    t = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # illumination at scan position i: the centered profile rolled so its
    # peak lands on column i (ill[x] = eff[(x - i + w//2) % w])
    ill = pltpu.roll(eff_col_ref[...], (i + w - w // 2) % w, 0)   # [W, 1]
    emitted_t = sample_yt_ref[...] * ill                          # [W, H]
    cam_t = jnp.dot(gx_mat_t_ref[...], emitted_t,
                    preferred_element_type=jnp.float32,
                    precision=_PRECISION)          # [W, H]
    if binned_w != w:
        cam_t = jnp.dot(brow_ref[...], cam_t,
                        preferred_element_type=jnp.float32,
                        precision=_PRECISION)  # [W/b, H]
        cam_t = jnp.dot(cam_t, bcol_ref[...],
                        preferred_element_type=jnp.float32,
                        precision=_PRECISION)  # [W/b, H/b]
    frame_scratch[:] = jnp.zeros_like(frame_scratch)
    if noisy:
        # Per-camera-frame shot noise from the hardware PRNG, drawn on the
        # re-binned frame -- distributionally identical to per-pixel draws
        # before binning (sums of independent Poissons are Poisson).
        # Sampled in 32-row chunks written straight into the scratch ref:
        # storing each chunk ends its sampler temporaries' liveness on the
        # Mosaic kernel stack (a whole-frame draw needs >16 MB scoped VMEM
        # at 512^2), and the fine granularity lets store_poisson_tiered skip
        # the expensive sampler tiers on the (majority) dark chunks.
        from rescan_line_sted_tpu.kernels.poisson_pallas import (
            store_poisson_tiered,
        )

        rows = binned_w
        cr = 32 if rows % 32 == 0 and rows > 32 else rows
        n_chunks = rows // cr
        for k2 in range(n_chunks):
            store_poisson_tiered(
                frame_scratch, slice(k2 * cr, (k2 + 1) * cr),
                cam_t[k2 * cr:(k2 + 1) * cr, :],
                (seed_ref[0],
                 seed_ref[1] + (i * n_tiles + t) * n_chunks + k2))
    else:
        frame_scratch[:binned_w, :] = cam_t

    off = offsets_ref[i]
    base = pl.multiple_of((off // 8) * 8, 8)
    r = off % 8
    rotated = jax.lax.switch(
        r, [lambda f, k=k: pltpu.roll(f, k, 0) for k in range(8)],
        frame_scratch[...])
    out_ref[pl.ds(base, w_pad), :] += rotated


def rescan_fused(sample_y: jnp.ndarray, eff_scaled: jnp.ndarray,
                 gx_mat: jnp.ndarray, offsets: jnp.ndarray, wc: int,
                 binning: int = 1,
                 seed: jnp.ndarray | None = None,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Fused rescan scan over all W column positions (see module doc).

    sample_y: [H, W] y-convolved sample; eff_scaled: [W] centered
    brightness-scaled effective excitation profile; gx_mat: [W, W] circulant
    of the detection x-profile (``cam = emitted @ gx_mat``); offsets: [W]
    int32 canvas column offsets (in binned pixels), one per scan position;
    ``binning`` sums camera pixels in b x b blocks before reassignment (two
    extra in-kernel matmuls). ``seed`` ([2] int32) draws per-camera-frame
    Poisson shot noise from the hardware PRNG inside the kernel (TPU only;
    the interpreter's PRNG yields zeros); None = noise-free canvas [H/b, wc].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    noisy = seed is not None
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    h, w = sample_y.shape
    b = binning
    n = offsets.shape[0]
    if n != w:
        raise ValueError("fused scan visits every column: need W offsets")
    hb, wb = h // b, w // b
    w_pad = _round_up(wb, 8) + 8
    if w_pad > wc:
        raise ValueError("frame wider than canvas; use the lax.scan engine")
    offsets = jnp.asarray(offsets, jnp.int32) % wc

    # Lane tiling (noisy mode): the in-kernel Poisson sampler keeps ~8 live
    # frame-sized temporaries on the Mosaic kernel stack, so the camera is
    # produced and sampled 128 binned lanes at a time; the canvas tile stays
    # resident across the whole scan (positions advance fastest).
    lane_out = 128 if (noisy and hb % 128 == 0 and hb > 128) else hb
    n_tiles = hb // lane_out
    lane_in = lane_out * b

    in_specs = [
        pl.BlockSpec((w, 1), lambda t, i, offs, sd: (0, 0),
                     memory_space=pltpu.VMEM),        # eff column
        pl.BlockSpec((w, lane_in), lambda t, i, offs, sd: (0, t),
                     memory_space=pltpu.VMEM),        # sample_y^T tile
        pl.BlockSpec((w, w), lambda t, i, offs, sd: (0, 0),
                     memory_space=pltpu.VMEM),        # circulant^T
    ]
    # Kernel computes cam^T = M @ emitted^T; engine contract is
    # cam = emitted @ gx_mat, so M = gx_mat^T (a no-op for the even
    # detection profile's symmetric circulant, but exact in general).
    args = [offsets, jnp.asarray(seed, jnp.int32), eff_scaled.reshape(w, 1),
            sample_y.T, gx_mat.T]
    if b != 1:
        eye = jnp.eye(wb, dtype=jnp.float32)
        brow = jnp.repeat(eye, b, axis=1)             # [W/b, W] row binning
        eyeh = jnp.eye(hb, dtype=jnp.float32)
        bcol = jnp.repeat(eyeh, b, axis=0)            # [H, H/b] col binning
        in_specs += [
            pl.BlockSpec((wb, w), lambda t, i, offs, sd: (0, 0),
                         memory_space=pltpu.VMEM),
            # block-diagonal: rows b*t*lane_out.. map to cols t*lane_out..
            pl.BlockSpec((lane_in, lane_out), lambda t, i, offs, sd: (t, t),
                         memory_space=pltpu.VMEM),
        ]
        args += [brow, bcol]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n),                            # positions fastest
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wc + w_pad, lane_out),
                               lambda t, i, offs, sd: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w_pad, lane_out), jnp.float32)],
    )
    padded_t = pl.pallas_call(
        functools.partial(_fused_kernel, w=w, w_pad=w_pad, binned_w=wb,
                          noisy=noisy, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((wc + w_pad, hb), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    delta_t = padded_t[:wc].at[:w_pad].add(padded_t[wc:])
    return delta_t.T
