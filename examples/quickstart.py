"""Quickstart: simulate, compare, fuse. Run from the repo root:

    python examples/quickstart.py [--platform cpu]
"""

import sys

sys.path.insert(0, ".")

if "--platform" in sys.argv:
    import jax

    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])

import jax
import jax.numpy as jnp
import numpy as np

import rescan_line_sted_tpu as rls
from rescan_line_sted_tpu.algorithms import (
    richardson_lucy_views,
    system_resolution_report,
)
from rescan_line_sted_tpu.data import siemens_star
from rescan_line_sted_tpu.imaging import (
    line_sted_image,
    point_sted_image,
    rescanned_line_sted_image,
)
from rescan_line_sted_tpu.imaging.orientations import multi_orientation_line_sted
from rescan_line_sted_tpu.sweeps import dose_matched_sweep

size = 256
grid = rls.Grid(size, size)
sample = siemens_star((size, size))
key = jax.random.key(0)

# --- 1. one acquisition per modality, shot noise included ---------------
point = point_sted_image(
    sample, rls.PointSTEDParams.create(depletion=8.0, brightness=200.0),
    rls.PointSTEDGeometry(grid), key=key)
line = line_sted_image(
    sample, rls.LineSTEDParams.create(depletion=8.0, brightness=200.0),
    rls.LineSTEDGeometry(grid), key=key)
rescan = rescanned_line_sted_image(
    sample, rls.RescanParams.create(depletion=8.0, brightness=200.0),
    rls.RescanGeometry(grid, rescan_factor=2.0), key=key)
print(f"point {point.image.shape} | line {line.image.shape} | "
      f"rescan canvas {rescan.image.shape}")
print(f"line-STED needs {int(line.dose.num_steps)} scan steps vs "
      f"{int(point.dose.num_steps)} for point-STED")

# --- 2. resolution vs depletion power ------------------------------------
for s in (0.0, 4.0, 16.0):
    rep = system_resolution_report(
        (size, size), rls.PointSTEDParams.create(depletion=s))
    print(f"s={s:5.1f}: point-STED FWHM = {float(rep.fwhm_x):.2f} px")

# --- 3. the dose-matched comparison sweep: one XLA program ---------------
sweep = jax.jit(lambda p, k: dose_matched_sweep(
    sample,
    rls.PointSTEDParams.create(brightness=1.0),
    rls.LineSTEDParams.create(brightness=1.0),
    rls.PointSTEDGeometry(grid), rls.LineSTEDGeometry(grid),
    p, dose_budget=100.0, key=k, orientations=2,
))(jnp.linspace(0.0, 16.0, 8), key)
print("sweep FWHM(point):", np.round(np.asarray(sweep.point.fwhm_x), 2))
print("sweep FWHM(line): ", np.round(np.asarray(sweep.line.fwhm_x), 2))

# --- 4. multi-orientation fusion to isotropic resolution ------------------
params = rls.LineSTEDParams.create(depletion=8.0, brightness=200.0)
views, kernels = multi_orientation_line_sted(
    sample, params, rls.LineSTEDGeometry(grid),
    jnp.asarray([0.0, jnp.pi / 2]), key=key)
fused = richardson_lucy_views(views, kernels, num_iter=50)
print(f"fused image: {fused.shape}, total signal {float(fused.sum()):.3e}")
print("done.")
