"""Hybrid vs FFT-path crossover for per-step rescan noise (VERDICT r2 #6).

The hybrid's DFT-matmul placement scales ~W^2 K H per chunk while the FFT
path scales ~W K H log W -- beyond some width the (otherwise slower) FFT
path must win. Measures both engines through the PUBLIC API at fractional
R = 1.5 (subpixel placement, both paths reachable):

  hybrid   rescanned_line_sted_image(..., per_step)            [default]
  fftpath  same with use_pallas=False (threefry Poisson + XLA rfft)

at W in {512, 1024, 2048}; the winner sets the auto-routing threshold in
imaging/rescan.py.
"""

import os
import sys
import time

sys.path.insert(0, ".")

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rescan_line_sted_tpu.config import (  # noqa: E402
    Grid,
    LineSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.data import samples  # noqa: E402
from rescan_line_sted_tpu.imaging import rescanned_line_sted_image  # noqa: E402
from rescan_line_sted_tpu.utils.observability import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

params = LineSTEDParams.create(depletion=8.0, sigma_exc=3.0, sigma_det=3.0,
                               stripe_period=12.0, brightness=1.0)


def amortized(size, use_pallas, n=4, seed_off=0):
    geom = RescanGeometry(Grid(size, size), rescan_factor=1.5, chunk=32)
    sample = jax.jit(lambda: samples.siemens_star((size, size)))()
    hc, wc = geom.canvas_shape

    def many(s, keys):
        def body(acc, k):
            img = rescanned_line_sted_image(
                s, params, geom, key=k, method="scan",
                noise_mode="per_step", use_pallas=use_pallas).image
            return acc + img, None
        out, _ = jax.lax.scan(body, jnp.zeros((hc, wc), jnp.float32), keys)
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


sizes = [int(s) for s in (sys.argv[1:] or [512, 1024, 2048])]
for i, size in enumerate(sizes):
    dt_h = amortized(size, None, seed_off=1000 * i)
    dt_f = amortized(size, False, seed_off=1000 * i + 500)
    print(f"W={size:5d}  hybrid {dt_h * 1e3:9.1f} ms/img "
          f"({size / dt_h:9.0f} steps/s)   "
          f"fftpath {dt_f * 1e3:9.1f} ms/img ({size / dt_f:9.0f} steps/s)  "
          f"hybrid/fft = {dt_h / dt_f:.2f}")
