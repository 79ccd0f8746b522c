"""Gather-based circular shifts of centered PSFs to scan positions.

The reference shifts the illumination PSF to each scan position inside its
Python hot loop (SURVEY.md section 4.1, ``ill = shift(psf_eff, x0)``). Here a
whole *chunk* of scan positions is materialized at once as one gather, so the
downstream emit/convolve/detect work is a single batched XLA op per chunk.

A centered array has its peak at ``n // 2``; shifting it "to position p"
places the peak at index p, wrapping circularly:
``shifted[i] = arr[(i - p + n//2) % n]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def shifted_profiles(profile: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Shift a centered 1D profile [W] to each position: out [C, W]."""
    w = profile.shape[-1]
    idx = (jnp.arange(w)[None, :] - positions[:, None] + w // 2) % w
    return profile[idx]


def shifted_images(psf: jnp.ndarray, positions_yx: jnp.ndarray) -> jnp.ndarray:
    """Shift a centered 2D PSF [H, W] to each (y, x) position: out [C, H, W]."""
    h, w = psf.shape
    iy = (jnp.arange(h)[None, :] - positions_yx[:, 0:1] + h // 2) % h  # [C, H]
    ix = (jnp.arange(w)[None, :] - positions_yx[:, 1:2] + w // 2) % w  # [C, W]
    return psf[iy[:, :, None], ix[:, None, :]]


def flip_centered(arr: jnp.ndarray) -> jnp.ndarray:
    """Point-reflect a centered array through the grid center: out(v) = in(-v).

    With center ``c = n // 2``: ``out[i] = in[(2c - i) % n]`` -- plain
    reversal on odd axes, reversal plus a one-pixel roll on even axes.
    Flips every axis -- use on unbatched 1D profiles / 2D kernels only.
    """
    out = arr
    for ax in range(arr.ndim):
        out = jnp.flip(out, axis=ax)
        if arr.shape[ax] % 2 == 0:
            out = jnp.roll(out, 1, axis=ax)
    return out
