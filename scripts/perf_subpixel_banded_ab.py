"""A/B: rational-subpixel placement, banded fused kernel vs the prior
engines (rDFT hybrid / strips), after wiring q>1 classes (r3 cont.).

Arms (same honest amortized harness as perf_banded_fused_ab.py):

* banded -- defaults (banded fused engages with q classes)
* prior  -- RLS_BANDED_FUSED=0: the pre-banded default ladder
            (collapsed: strips/windowed rDFT; per-step: rDFT hybrid)

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_subpixel_banded_ab.py
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
    params = LineSTEDParams.create(
        depletion=8.0, sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0,
        slit_halfwidth=4.0, brightness=1.0)
    off = 0

    # the banded arm forces use_pallas=True so it measures the banded
    # kernel in EVERY cell -- default routing keeps per-step q>1 b=1 at
    # w <= 512 on the rDFT hybrid (the width gate in rescan._scan)
    arms = [("banded", None, True), ("prior", "0", None)]
    # steps 0.5 (q=2), 1.25 (q=4), 0.375 (q=8); all q | chunk=32
    for r_f, b, tag in [(1.5, 1, "R=1.5  q=2"), (2.25, 1, "R=2.25 q=4"),
                        (1.375, 1, "R=1.375 q=8"), (3.5, 2, "R=3.5 b=2 q=4")]:
        geom = RescanGeometry(Grid(size, size), rescan_factor=r_f,
                              binning=b, chunk=32)
        for mode in ("collapsed", "per_step"):
            for name, env, force in arms:
                if env is None:
                    os.environ.pop("RLS_BANDED_FUSED", None)
                else:
                    os.environ["RLS_BANDED_FUSED"] = env
                off += 37
                dt = amortized_s(
                    lambda s, p, k: rescanned_line_sted_image(
                        s, p, geom, key=k, method="scan", noise_mode=mode,
                        reassignment="subpixel", use_pallas=force).image,
                    sample, params, geom.canvas_shape, seed_off=off)
                print(f"{tag}  {mode:9s} {name:7s} "
                      f"{size / dt:10,.0f} steps/s  ({dt * 1e3:6.2f} ms/img)",
                      flush=True)
    os.environ.pop("RLS_BANDED_FUSED", None)


if __name__ == "__main__":
    main()
