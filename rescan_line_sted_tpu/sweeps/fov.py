"""Batched resolution / FOV sweep (BASELINE config 5, final stage).

For each field-of-view size, acquire multi-orientation line-STED of a
point-emitter lattice, fuse with Richardson-Lucy, and measure the restored
resolution and wall-clock. FOV sizes change array shapes (one compile per
size, a static Python loop); everything per-size runs as one jitted program
with the orientation axis vmapped -- shard it over a mesh "batch" axis for
multi-chip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.algorithms import richardson_lucy_views
from rescan_line_sted_tpu.algorithms.metrics import fwhm_2d
from rescan_line_sted_tpu.config import Grid, LineSTEDGeometry, LineSTEDParams
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging.orientations import multi_orientation_line_sted


def resolution_fov_sweep(
    sizes: tuple[int, ...],
    params: LineSTEDParams,
    num_angles: int = 4,
    rl_iters: int = 40,
    key: jax.Array | None = None,
    spacing: int = 24,
) -> list[dict]:
    """Returns one record per FOV size: fused FWHM, scan steps, wall times."""
    records = []
    for size in sizes:
        grid = Grid(size, size)
        geom = LineSTEDGeometry(grid, chunk=min(32, size))
        sample = samples.sparse_points((size, size), spacing=spacing)
        angles = jnp.arange(num_angles) * (jnp.pi / num_angles)

        @jax.jit
        def run(sample, key, _geom=geom, _angles=angles):
            views, kernels = multi_orientation_line_sted(
                sample, params, _geom, _angles, key=key)
            fused = richardson_lucy_views(views, kernels, num_iter=rl_iters)
            return fused, kernels

        t0 = time.perf_counter()
        fused, kernels = jax.block_until_ready(run(sample, key))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fused, kernels = jax.block_until_ready(run(sample, key))
        run_s = time.perf_counter() - t0

        # measure several interior lattice points and average: a single
        # point's restored FWHM is noisy under Poisson draws
        c = spacing // 2 + spacing * ((size // 2 - spacing // 2) // spacing)
        half = spacing // 2
        centers = [c]
        for d in (-spacing, spacing):
            if half <= c + d < size - half:
                centers.extend([c + d])
        pts = [(cy, cx) for cy in centers for cx in centers]

        def point_fwhm(cy, cx):
            patch = jax.lax.dynamic_slice(fused, (cy - half, cx - half),
                                          (2 * half, 2 * half))
            return fwhm_2d(patch)

        fys, fxs = zip(*(point_fwhm(cy, cx) for cy, cx in pts))
        fy = jnp.nanmean(jnp.stack(fys))
        fx = jnp.nanmean(jnp.stack(fxs))
        ky, kx = fwhm_2d(kernels[0])
        records.append({
            "fov": size,
            "scan_steps": size * num_angles,
            "fused_fwhm_y": float(fy),
            "fused_fwhm_x": float(fx),
            "view_kernel_fwhm_y": float(ky),
            "view_kernel_fwhm_x": float(kx),
            "wall_s": run_s,
            "compile_s": compile_s,
        })
    return records
