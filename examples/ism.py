"""Rescanned point-STED (ISM) in five lines, plus deconvolution.

The 2D-pixel-reassignment modality (imaging/rescan_point.py, beyond the
reference's line-rescan): acquire a magnified canvas with the closed-form
engine, then sharpen it further with system-kernel RL.

Run: python examples/ism.py
"""

import jax
import numpy as np

import rescan_line_sted_tpu as rls
from rescan_line_sted_tpu.algorithms import ism_deconvolve
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import (
    optimal_rescan_factor_point,
    practical_rescan_factor_point,
    rescanned_point_sted_image,
)


def main():
    size = 128
    sample = samples.siemens_star((size, size))
    params = rls.PointSTEDParams.create(depletion=8.0, brightness=200.0)

    r_opt = float(jax.jit(
        lambda: optimal_rescan_factor_point(params, size))())
    r_prac = float(jax.jit(
        lambda: practical_rescan_factor_point(params, size))())
    print(f"theory-optimal rescan factor: {r_opt:.2f}; practical "
          f"(within 5% of optimal resolution): {r_prac:.2f}")

    geom = rls.RescanPointGeometry(rls.Grid(size, size),
                                   rescan_factor=round(r_prac, 2))
    res = jax.jit(lambda s, k: rescanned_point_sted_image(
        s, params, geom, key=k))(sample, jax.random.key(0))
    canvas = np.asarray(res.image)
    print(f"canvas {canvas.shape}, total photons {canvas.sum():.0f}, "
          f"scan steps {float(res.dose.num_steps):.0f}")

    est = np.asarray(jax.jit(lambda c: ism_deconvolve(
        c, params, geom, num_iter=50))(res.image))
    # energy concentration (peak/total) rises as RL sharpens the canvas;
    # report the ratio so the number is readable at any canvas size
    sharpen = (est.max() / est.sum()) / (canvas.max() / canvas.sum())
    print(f"RL deconvolution concentrates the canvas {sharpen:.1f}x "
          f"(peak/total {est.max() / est.sum():.2e} vs raw "
          f"{canvas.max() / canvas.sum():.2e})")


if __name__ == "__main__":
    main()
