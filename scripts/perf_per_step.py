"""Measure per-step-noise rescan/line scan paths on hardware.

Amortized device time (N iterations folded into one jitted lax.scan; see
docs/PERFORMANCE.md "Measurement methodology") for every per-step-noise
placement/sampling engine, to locate the remaining headroom (ROADMAP #1).

Run on the TPU:  python scripts/perf_per_step.py [size]
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
    LineSTEDGeometry,
    LineSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.data import samples  # noqa: E402
from rescan_line_sted_tpu.imaging import (  # noqa: E402
    line_sted_image,
    rescanned_line_sted_image,
)

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
LINE_KW = dict(sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0,
               slit_halfwidth=4.0, brightness=1.0)


def amortized(make_image, sample, out_shape, n=8, seed_off=0):
    def many(s, keys):
        def body(acc, k):
            return acc + make_image(s, k), None
        out, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32), keys)
        return out

    f = jax.jit(many)
    t0 = time.perf_counter()
    jax.block_until_ready(
        f(sample, jax.random.split(jax.random.key(RUN_SEED + seed_off), n)))
    compile_s = time.perf_counter() - t0
    keys = jax.random.split(jax.random.key(RUN_SEED + seed_off + 1), n)
    t0 = time.perf_counter()
    jax.block_until_ready(f(sample, keys))
    return (time.perf_counter() - t0) / n, compile_s


def main():
    print(f"device={jax.devices()[0]}, size={SIZE}")
    sample = samples.siemens_star((SIZE, SIZE))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    grid = Grid(SIZE, SIZE)

    cases = []

    rg = RescanGeometry(grid, rescan_factor=2.0, chunk=32)
    cases.append(("rescan per-step FUSED megakernel (default)", rg.canvas_shape,
                  lambda s, k: rescanned_line_sted_image(
                      s, params, rg, key=k, method="scan",
                      noise_mode="per_step").image, 10))
    cases.append(("rescan per-step scatter lax.scan (use_pallas=False)",
                  rg.canvas_shape,
                  lambda s, k: rescanned_line_sted_image(
                      s, params, rg, key=k, method="scan",
                      noise_mode="per_step", use_pallas=False).image, 20))
    cases.append(("rescan per-step SUBPIXEL phase-accum (R=2, forced)",
                  rg.canvas_shape,
                  lambda s, k: rescanned_line_sted_image(
                      s, params, rg, key=k, method="scan",
                      noise_mode="per_step", reassignment="subpixel").image,
                  30))
    rg15 = RescanGeometry(grid, rescan_factor=1.5, chunk=32)
    cases.append(("rescan per-step subpixel R=1.5 (only engine for frac R)",
                  rg15.canvas_shape,
                  lambda s, k: rescanned_line_sted_image(
                      s, params, rg15, key=k, method="scan",
                      noise_mode="per_step").image, 40))
    cases.append(("rescan collapsed phase-accum (reference point)",
                  rg.canvas_shape,
                  lambda s, k: rescanned_line_sted_image(
                      s, params, rg, key=k, method="scan",
                      noise_mode="collapsed").image, 50))

    lg = LineSTEDGeometry(grid, chunk=32)
    cases.append(("line per-step FUSED megakernel (default)", (SIZE, SIZE),
                  lambda s, k: line_sted_image(
                      s, params, lg, key=k, method="scan",
                      noise_mode="per_step").image, 60))
    cases.append(("line per-step lax.scan (use_pallas=False)", (SIZE, SIZE),
                  lambda s, k: line_sted_image(
                      s, params, lg, key=k, method="scan",
                      noise_mode="per_step", use_pallas=False).image, 70))

    pat = os.environ.get("CASES", "")
    for name, shape, fn, off in cases:
        if pat and pat.lower() not in name.lower():
            continue
        try:
            dt, cs = amortized(fn, sample, shape, seed_off=off)
            print(f"{name:58s} {SIZE / dt:10.1f} steps/s "
                  f"({dt * 1e3:7.2f} ms/img, compile {cs:.1f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:58s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
