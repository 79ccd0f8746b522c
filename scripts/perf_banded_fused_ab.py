"""A/B: banded fused megakernel vs full megakernel vs the windowed hybrid.

Rounded placements only (where the banded fused kernel engages). Three
arms per config, same honest amortized harness as perf_honest_ab.py:

* default    -- use_pallas unset: the windowed/strips lax.scan engines
                (current per-step and collapsed champions)
* mega       -- use_pallas=True, RLS_BANDED_FUSED=0: full-frame fused
                megakernel (kernels/rescan_fused.py)
* banded     -- use_pallas=True, RLS_BANDED_FUSED=1: banded fused
                megakernel (kernels/rescan_banded_fused.py)

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_banded_fused_ab.py
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

    arms = [("default", None, None), ("mega", True, "0"),
            ("banded", True, "1")]
    for r_f, b, tag in [(2.0, 1, "R=2.0 b=1"), (3.0, 1, "R=3.0 b=1"),
                        (3.0, 2, "R=3.0 b=2")]:
        geom = RescanGeometry(Grid(size, size), rescan_factor=r_f,
                              binning=b, chunk=32)
        for mode in ("collapsed", "per_step"):
            for name, up, env in arms:
                if env is None:
                    os.environ.pop("RLS_BANDED_FUSED", None)
                else:
                    os.environ["RLS_BANDED_FUSED"] = env
                off += 37
                dt = amortized_s(
                    lambda s, p, k: rescanned_line_sted_image(
                        s, p, geom, key=k, method="scan", noise_mode=mode,
                        reassignment="rounded", use_pallas=up).image,
                    sample, params, geom.canvas_shape, seed_off=off)
                print(f"{tag}  {mode:9s} {name:8s} "
                      f"{size / dt:10,.0f} steps/s  ({dt * 1e3:6.2f} ms/img)",
                      flush=True)
    os.environ.pop("RLS_BANDED_FUSED", None)


if __name__ == "__main__":
    main()
