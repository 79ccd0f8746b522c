"""A/B at 2048^2: per-step fractional R=1.5 (q=2, b=1) -- rDFT hybrid
(current default, excluded from banded by the 512^2 measurement) vs the
banded fused kernel (use_pallas=True)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.config import Grid, LineSTEDParams, RescanGeometry
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
from rescan_line_sted_tpu.utils.observability import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())


def timed(name, body, sample, out_shape, n=3):
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
    print(f"{name}: {best*1e3:.1f} ms/img = {2048/best:,.0f} steps/s")
    return best


for size, chunk in [(2048, 32), (1024, 32), (512, 32)]:
    sample = samples.siemens_star((size, size))
    params = LineSTEDParams.create(depletion=8.0, sigma_exc=3.0,
                                   sigma_det=2.0, stripe_period=12.0,
                                   slit_halfwidth=3.0, brightness=50.0)
    geom = RescanGeometry(Grid(size, size), rescan_factor=1.5, chunk=chunk)
    shape = geom.canvas_shape
    print(f"--- {size}^2, R=1.5, b=1, per-step ---")
    timed("hybrid (default)", lambda s, k: rescanned_line_sted_image(
        s, params, geom, key=k, method="scan",
        noise_mode="per_step").image, sample, shape)
    timed("banded fused (use_pallas=True)",
          lambda s, k: rescanned_line_sted_image(
              s, params, geom, key=k, method="scan", noise_mode="per_step",
              use_pallas=True).image, sample, shape)
