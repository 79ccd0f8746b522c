"""A/B engine routings under the HONEST amortized harness (r3).

The r2/early-r3 amortized harness let XLA hoist every noise-free stage out
of the N-iteration timing loop (loop-invariant code motion): collapsed
engines effectively timed only their final Poisson draw. This script
re-measures the competing engine routings with the fixed harness (sample
perturbed by the per-iteration key; in-jit scalar checksum) so the
defaults are chosen on real per-acquisition cost.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_honest_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax
import jax.numpy as jnp

from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import (
    line_sted_image,
    rescanned_line_sted_image,
)
from rescan_line_sted_tpu.utils.observability import enable_compilation_cache


def amortized_s(make_image, sample, params, out_shape, n=10, seed_off=0):
    def many(s, p, keys):
        def body(acc, k):
            s_k = s * (1.0 + 1e-6 * jax.random.uniform(k))
            return acc + make_image(s_k, p, k), None
        out, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32), keys)
        return jnp.sum(out)

    f = jax.jit(many)
    jax.block_until_ready(f(
        sample, params,
        jax.random.split(jax.random.key(RUN_SEED + seed_off), n)))
    best = 1e30
    for r in range(3):
        keys = jax.random.split(
            jax.random.key(RUN_SEED + seed_off + 1 + r), n)
        t0 = time.perf_counter()
        float(f(sample, params, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    enable_compilation_cache()
    size = 512
    sample = samples.siemens_star((size, size))
    lparams = LineSTEDParams.create(
        depletion=8.0, sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0,
        slit_halfwidth=4.0, brightness=1.0)
    off = 0

    def run(tag, fn, out_shape, n=10):
        nonlocal off
        off += 37
        dt = amortized_s(fn, sample, lparams, out_shape, n=n, seed_off=off)
        print(f"{tag:55s} {size / dt:10,.0f} steps/s  ({dt * 1e3:7.2f} ms/img)",
              flush=True)
        return size / dt

    geom_r = RescanGeometry(Grid(size, size), rescan_factor=2.0, chunk=32)
    cshape = geom_r.canvas_shape

    # -- collapsed rescan: three competing engines --------------------------
    run("rescan collapsed DEFAULT (windowed DFT)",
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom_r, key=k, method="scan").image, cshape)
    run("rescan collapsed use_pallas=True (fused megakernel)",
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom_r, key=k, method="scan", use_pallas=True).image,
        cshape)
    run("rescan collapsed use_pallas=False (scatter/spectral)",
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom_r, key=k, method="scan", use_pallas=False).image,
        cshape)
    run("rescan collapsed analytic (closed form)",
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom_r, key=k, method="analytic").image, cshape)

    # -- per-step rescan -----------------------------------------------------
    run("rescan per-step DEFAULT (windowed hybrid)",
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom_r, key=k, method="scan",
            noise_mode="per_step").image, cshape)
    run("rescan per-step use_pallas=True (fused megakernel)",
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom_r, key=k, method="scan", use_pallas=True,
            noise_mode="per_step").image, cshape)

    # -- line engine ---------------------------------------------------------
    geom_l = LineSTEDGeometry(Grid(size, size), chunk=32)
    run("line collapsed scan DEFAULT",
        lambda s, p, k: line_sted_image(
            s, p, geom_l, key=k, method="scan").image, (size, size))
    run("line collapsed analytic",
        lambda s, p, k: line_sted_image(
            s, p, geom_l, key=k, method="analytic").image, (size, size))
    run("line per-step DEFAULT (banded)",
        lambda s, p, k: line_sted_image(
            s, p, geom_l, key=k, method="scan",
            noise_mode="per_step").image, (size, size))
    run("line per-step use_pallas=True (fused megakernel)",
        lambda s, p, k: line_sted_image(
            s, p, geom_l, key=k, method="scan", use_pallas=True,
            noise_mode="per_step").image, (size, size))


if __name__ == "__main__":
    main()
