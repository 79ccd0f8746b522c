"""Jittable image rotation (bilinear), used for multi-orientation acquisition.

The reference rotates the sample/PSF between line-STED orientations
(SURVEY.md component C10, scipy.ndimage-style). This version is pure jnp
(gather-based ``map_coordinates``), differentiable in the angle, and
vmap-able over a batch of angles.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def rotate_image(img: jnp.ndarray, theta, order: int = 1) -> jnp.ndarray:
    """Rotate ``img`` [H, W] by ``theta`` radians about the grid center.

    Counter-clockwise in (y-down) array coordinates; bilinear interpolation,
    zero fill outside the input.
    """
    h, w = img.shape[-2:]
    cy, cx = h // 2, w // 2
    y = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    x = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse rotation: source coords for each output pixel
    src_y = cos * y + sin * x + cy
    src_x = -sin * y + cos * x + cx
    coords = jnp.stack([jnp.broadcast_to(src_y, (h, w)),
                        jnp.broadcast_to(src_x, (h, w))])
    return map_coordinates(img, coords, order=order, mode="constant", cval=0.0)
