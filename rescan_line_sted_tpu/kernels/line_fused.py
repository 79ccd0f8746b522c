"""Fused descanned line-STED scan-loop megakernel with in-kernel shot noise.

One ``pallas_call`` executes the ENTIRE per-step-noise line-STED scan
(reference hot loop 4.2 with component C7 *inside* it). The grid is
``(H/LANE lane tiles, W positions)``: each step rolls the camera frame so
its scan position is centered, emits (``sample_y^T * ill``), x-convolves
with the detection profile as an MXU matmul against its circulant, draws
per-camera-pixel Poisson shot noise from the hardware PRNG
(``kernels/poisson_pallas.sample_poisson``) WITHOUT leaving VMEM, and
slit-sums the noisy frame into its output row.

Two tricks make the noise nearly free:

* **Slit-window sampling.** Descanned detection only reads camera pixels
  inside the slit, so noise on the rest of the frame never reaches the
  output. The frame is rolled so the scan position sits at ``w//2`` (making
  the slit support a STATIC row window), only that window is sampled, and
  the (physically irrelevant, slit-masked) remainder contributes its mean.
  Exact as long as the slit halfwidth fits the window -- the engine's
  ``slit_support`` parameter.
* **Scratch-chunked draws.** The unrolled sampler holds ~34 rounds of
  temporaries; writing sampled chunks straight into a scratch ref bounds
  the Mosaic kernel stack (whole-frame draws need >16 MB scoped VMEM).

Everything is laid out transposed ([W, H]-major) like rescan_fused so the
rolls and the slit reduction act on the sublane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rescan_line_sted_tpu.kernels.poisson_pallas import sample_poisson

from rescan_line_sted_tpu.config import matmul_precision

# engine matmul precision (HIGHEST unless RLS_MATMUL_PRECISION overrides;
# see config.matmul_precision for the measured error budget)
_PRECISION = matmul_precision(pallas=True)

_POS_BLOCK = 8   # output rows written per block (must be 8-aligned)
_LANE = 128      # camera lanes (y pixels) per tile


def _line_kernel(seed_ref, eff_col_ref, slit_win_ref, slit_out_ref,
                 sample_yt_ref, gx_mat_t_ref, out_ref, samp_scratch, *,
                 w: int, win: int, n_tiles: int, noisy: bool):
    t = pl.program_id(0)
    pos = pl.program_id(1)
    shift = (pos + w - w // 2) % w
    ill = pltpu.roll(eff_col_ref[...], shift, 0)                  # [W, 1]
    emitted_t = sample_yt_ref[...] * ill                          # [W, L]
    cam_t = jnp.dot(gx_mat_t_ref[...], emitted_t,
                    preferred_element_type=jnp.float32,
                    precision=_PRECISION)          # [W, L]
    # roll the frame so scan position `pos` sits at row w//2: the slit
    # support becomes the static window [w//2 - win//2, w//2 + win//2)
    cam_c = pltpu.roll(cam_t, (w // 2 - pos + w) % w, 0)
    lo = w // 2 - win // 2
    if noisy:
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + pos * n_tiles + t)
        samp_scratch[...] = sample_poisson(cam_c[lo:lo + win, :],
                                           batched=True)
        row = (jnp.sum(samp_scratch[...] * slit_win_ref[...], axis=0)
               + jnp.sum(cam_c * slit_out_ref[...], axis=0))      # [L]
    else:
        row = (jnp.sum(cam_c[lo:lo + win, :] * slit_win_ref[...], axis=0)
               + jnp.sum(cam_c * slit_out_ref[...], axis=0))
    for j in range(_POS_BLOCK):
        @pl.when(pos % _POS_BLOCK == j)
        def _store(j=j):
            out_ref[j, :] = row


def line_sted_fused(sample_y: jnp.ndarray, eff_scaled: jnp.ndarray,
                    gx_mat: jnp.ndarray, slit: jnp.ndarray,
                    seed: jnp.ndarray | None,
                    slit_support: int = 64,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Fused per-step line-STED scan over all W column positions.

    sample_y: [H, W] y-convolved sample; eff_scaled: [W] centered
    brightness-scaled effective excitation profile; gx_mat: [W, W] circulant
    of the detection x-profile (``cam = emitted @ gx_mat``); slit: [W]
    centered slit profile; seed: [2] int32 PRNG seed for per-frame Poisson
    draws (None = noise-free). ``slit_support`` is the static sampled-window
    height; the slit must vanish outside the centered window or the
    out-of-window pixels contribute their noise-free mean (the wrapper in
    ``imaging/line_sted.py`` checks this). Returns the descanned image
    [H, W].

    TPU only when ``seed`` is given: the Pallas interpreter implements
    ``prng_random_bits`` as zeros (see poisson_pallas.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = sample_y.shape
    if w % _POS_BLOCK:
        raise ValueError(f"width must be a multiple of {_POS_BLOCK}")
    win = min(w, ((slit_support + 7) // 8) * 8)
    lane = _LANE if h % _LANE == 0 else h
    n_tiles = h // lane
    noisy = seed is not None
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)

    lo = w // 2 - win // 2
    window = jnp.zeros((w,), jnp.float32).at[lo:lo + win].set(1.0)
    slit_win = slit[lo:lo + win]          # slit inside the sampled window
    slit_out = slit * (1.0 - window)      # remainder (mean contribution)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, w),                 # positions advance fastest
        in_specs=[
            pl.BlockSpec((w, 1), lambda t, i, s: (0, 0),
                         memory_space=pltpu.VMEM),        # eff column
            pl.BlockSpec((win, 1), lambda t, i, s: (0, 0),
                         memory_space=pltpu.VMEM),        # slit window
            pl.BlockSpec((w, 1), lambda t, i, s: (0, 0),
                         memory_space=pltpu.VMEM),        # slit remainder
            pl.BlockSpec((w, lane), lambda t, i, s: (0, t),
                         memory_space=pltpu.VMEM),        # sample_y^T tile
            pl.BlockSpec((w, w), lambda t, i, s: (0, 0),
                         memory_space=pltpu.VMEM),        # circulant^T
        ],
        # 8 consecutive steps share one [8, LANE] output block, each writing
        # its own row: static stores, no dynamic-sublane alignment dance
        out_specs=pl.BlockSpec((_POS_BLOCK, lane),
                               lambda t, i, s: (i // _POS_BLOCK, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((win, lane), jnp.float32)],
    )
    # Kernel computes cam^T = M @ emitted^T; engine contract is
    # cam = emitted @ gx_mat, so M = gx_mat^T.
    img_t = pl.pallas_call(
        functools.partial(_line_kernel, w=w, win=win, n_tiles=n_tiles,
                          noisy=noisy),
        out_shape=jax.ShapeDtypeStruct((w, h), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed, eff_scaled.reshape(w, 1), slit_win.reshape(win, 1),
      slit_out.reshape(w, 1), sample_y.T, gx_mat.T)
    return img_t.T
