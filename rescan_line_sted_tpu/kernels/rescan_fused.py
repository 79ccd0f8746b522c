"""Fused rescan scan-loop megakernel.

One ``pallas_call`` executes the ENTIRE rescanned line-STED scan (collapsed
noise mode, binning=1). Grid step i IS scan position i: the kernel rotates
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(offsets_ref, eff_col_ref, sample_yt_ref, gx_mat_t_ref,
                  out_ref, frame_scratch, *, w: int, w_pad: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # illumination at scan position i: the centered profile rolled so its
    # peak lands on column i (ill[x] = eff[(x - i + w//2) % w])
    ill = pltpu.roll(eff_col_ref[...], (i + w - w // 2) % w, 0)   # [W, 1]
    emitted_t = sample_yt_ref[...] * ill                          # [W, H]
    cam_t = jnp.dot(gx_mat_t_ref[...], emitted_t,
                    preferred_element_type=jnp.float32)           # [W, H]
    frame_scratch[:] = jnp.zeros_like(frame_scratch)
    frame_scratch[:w, :] = cam_t

    off = offsets_ref[i]
    base = pl.multiple_of((off // 8) * 8, 8)
    r = off % 8
    rotated = jax.lax.switch(
        r, [lambda f, k=k: pltpu.roll(f, k, 0) for k in range(8)],
        frame_scratch[...])
    out_ref[pl.ds(base, w_pad), :] += rotated


def rescan_fused(sample_y: jnp.ndarray, eff_scaled: jnp.ndarray,
                 gx_mat: jnp.ndarray, offsets: jnp.ndarray, wc: int,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Fused rescan scan over all W column positions (see module doc).

    sample_y: [H, W] y-convolved sample; eff_scaled: [W] centered
    brightness-scaled effective excitation profile; gx_mat: [W, W] circulant
    of the detection x-profile (``cam = emitted @ gx_mat``); offsets: [W]
    int32 canvas column offsets, one per scan position. Returns the
    noise-free canvas [H, wc].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = sample_y.shape
    n = offsets.shape[0]
    if n != w:
        raise ValueError("fused scan visits every column: need W offsets")
    w_pad = _round_up(w, 8) + 8
    if w_pad > wc:
        raise ValueError("frame wider than canvas; use the lax.scan engine")
    offsets = jnp.asarray(offsets, jnp.int32) % wc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((w, 1), lambda i, offs: (0, 0),
                         memory_space=pltpu.VMEM),        # eff column
            pl.BlockSpec((w, h), lambda i, offs: (0, 0),
                         memory_space=pltpu.VMEM),        # sample_y^T
            pl.BlockSpec((w, w), lambda i, offs: (0, 0),
                         memory_space=pltpu.VMEM),        # circulant^T
        ],
        out_specs=pl.BlockSpec((wc + w_pad, h), lambda i, offs: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w_pad, h), jnp.float32)],
    )
    # Kernel computes cam^T = M @ emitted^T; engine contract is
    # cam = emitted @ gx_mat, so M = gx_mat^T (a no-op for the even
    # detection profile's symmetric circulant, but exact in general).
    padded_t = pl.pallas_call(
        functools.partial(_fused_kernel, w=w, w_pad=w_pad),
        out_shape=jax.ShapeDtypeStruct((wc + w_pad, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, eff_scaled.reshape(w, 1), sample_y.T, gx_mat.T)
    delta_t = padded_t[:wc].at[:w_pad].add(padded_t[wc:])
    return delta_t.T
