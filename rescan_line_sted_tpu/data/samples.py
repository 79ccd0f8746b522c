"""Procedural ground-truth test samples (reference component C12).

The reference ships test-sample images (resolution targets / line patterns)
as bundled TIFFs; here equivalent samples are generated procedurally in jnp
so no binary fixtures are needed and samples can be created at any grid size
(and on-device, under jit).

All samples are nonnegative f32 "fluorophore density" images with peak ~1.
"""

from __future__ import annotations

import jax.numpy as jnp


def _grid(shape: tuple[int, int]):
    y = jnp.arange(shape[0], dtype=jnp.float32) - shape[0] // 2
    x = jnp.arange(shape[1], dtype=jnp.float32) - shape[1] // 2
    return y[:, None], x[None, :]


def siemens_star(shape: tuple[int, int], spokes: int = 16,
                 inner: float = 2.0) -> jnp.ndarray:
    """Siemens-star resolution target: spoke spacing shrinks toward center."""
    y, x = _grid(shape)
    theta = jnp.arctan2(y, x)
    r = jnp.sqrt(y * y + x * x)
    star = 0.5 * (1.0 + jnp.sin(spokes * theta))
    edge = min(shape) / 2.0 - 1.0
    return jnp.where((r > inner) & (r < edge), star, 0.0).astype(jnp.float32)


def rings(shape: tuple[int, int], period: float = 12.0) -> jnp.ndarray:
    """Concentric rings with fixed radial period."""
    y, x = _grid(shape)
    r = jnp.sqrt(y * y + x * x)
    img = 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * r / period))
    edge = min(shape) / 2.0 - 1.0
    return jnp.where(r < edge, img, 0.0).astype(jnp.float32)


def line_pairs(shape: tuple[int, int], min_period: int = 4,
               max_period: int = 32) -> jnp.ndarray:
    """Vertical line pairs with spacing increasing left to right.

    The classic two-point/two-line resolution test: each band contains lines
    at one spatial period, from ``min_period`` up to ``max_period`` pixels.
    """
    h, w = shape
    x = jnp.arange(w, dtype=jnp.float32)
    # Smoothly chirped period across the field.
    frac = x / max(w - 1, 1)
    period = min_period * (max_period / min_period) ** frac
    phase = jnp.cumsum(2.0 * jnp.pi / period)
    stripes = 0.5 * (1.0 + jnp.sin(phase))
    img = jnp.broadcast_to(stripes[None, :], shape)
    return img.astype(jnp.float32)


def sparse_points(shape: tuple[int, int], spacing: int = 24) -> jnp.ndarray:
    """Isolated point emitters on a regular lattice (PSF measurement)."""
    img = jnp.zeros(shape, jnp.float32)
    ys = jnp.arange(spacing // 2, shape[0], spacing)
    xs = jnp.arange(spacing // 2, shape[1], spacing)
    return img.at[ys[:, None], xs[None, :]].set(1.0)
