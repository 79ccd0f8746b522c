"""Width A/B for the one per-step cell kept on the rDFT hybrid at 512^2:
fractional R=1.5 (q=2 classes, b=1) -- rDFT hybrid (RLS_BANDED_FUSED=0,
so the arm measures the hybrid at EVERY width; the default routing takes
the banded kernel above 512) vs the banded fused kernel (use_pallas=True).

The hybrid's rDFT placement work per step scales ~W^2 (DFT columns x
image rows both grow with W) while the banded kernel's integer scatter
does not, so the crossover sits between 512 and 1024 -- that measurement
is the basis of the ``w <= 512`` gate in ``rescan._scan``.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/perf_subpixel_banded_width_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.config import Grid, LineSTEDParams, RescanGeometry
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
from rescan_line_sted_tpu.utils.observability import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())


def timed(name, body, sample, out_shape, size, n=3):
    def outer(s, keys):
        def step(acc, k):
            s_k = s * (1.0 + 1e-6 * jax.random.uniform(k))
            return acc + body(s_k, k), None
        out, _ = jax.lax.scan(step, jnp.zeros(out_shape, jnp.float32), keys)
        return jnp.sum(out)

    f = jax.jit(outer)
    jax.block_until_ready(f(sample, jax.random.split(
        jax.random.key(RUN_SEED), n)))
    best = 1e30
    for r in range(3):
        keys = jax.random.split(jax.random.key(RUN_SEED + 1 + r), n)
        t0 = time.perf_counter()
        float(f(sample, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.1f} ms/img = {size/best:,.0f} steps/s")
    return best


_PRIOR_BANDED = os.environ.get("RLS_BANDED_FUSED")

for size, chunk in [(2048, 32), (1024, 32), (512, 32)]:
    sample = samples.siemens_star((size, size))
    params = LineSTEDParams.create(depletion=8.0, sigma_exc=3.0,
                                   sigma_det=2.0, stripe_period=12.0,
                                   slit_halfwidth=3.0, brightness=50.0)
    geom = RescanGeometry(Grid(size, size), rescan_factor=1.5, chunk=chunk)
    shape = geom.canvas_shape
    print(f"--- {size}^2, R=1.5, b=1, per-step ---")
    # the kill switch pins this arm to the rDFT hybrid at every width
    # (env is read at trace time; each timed() jits a fresh closure)
    os.environ["RLS_BANDED_FUSED"] = "0"
    timed("rDFT hybrid (RLS_BANDED_FUSED=0)",
          lambda s, k: rescanned_line_sted_image(
              s, params, geom, key=k, method="scan",
              noise_mode="per_step").image, sample, shape, size)
    os.environ["RLS_BANDED_FUSED"] = "1"
    timed("banded fused (use_pallas=True)",
          lambda s, k: rescanned_line_sted_image(
              s, params, geom, key=k, method="scan", noise_mode="per_step",
              use_pallas=True).image, sample, shape, size)

# restore whatever the caller had exported (don't clobber an external
# RLS_BANDED_FUSED=0 for later runs in the same shell/process)
if _PRIOR_BANDED is None:
    os.environ.pop("RLS_BANDED_FUSED", None)
else:
    os.environ["RLS_BANDED_FUSED"] = _PRIOR_BANDED
