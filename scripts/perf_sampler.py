"""Microbench: tiered-block Poisson sampler vs flat sampler on realistic
(mostly-dark, W-major transposed) camera-frame rates.  TPU only.

WARNING: UNRELIABLE through the axon tunnel -- isolated tiny programs
sometimes return in dispatch-only wall time regardless of the fold-in
methodology (numbers like 2+ Tpix/s are artifacts). Trust the
ENGINE-LEVEL measurements in perf_hybrid_stages.py instead; this file is
kept as a record of the failed approach (docs/PERFORMANCE.md
"Measurement methodology")."""

import os
import sys
import time

sys.path.insert(0, ".")

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rescan_line_sted_tpu.kernels.poisson_pallas import (  # noqa: E402
    poisson_pallas,
    poisson_rows_tiered,
)

C, W, H = 32, 512, 512


def make_lam(key):
    """Realistic transposed camera chunk: bright stripe rows per frame."""
    base = jax.random.uniform(key, (C, W, H), jnp.float32) * 1e-4
    rows = jnp.arange(W)[None, :, None]
    centers = (jnp.arange(C) * 16)[:, None, None]
    stripe = jnp.exp(-0.5 * ((rows - centers) / 6.0) ** 2) * 40.0
    return base + stripe


def timeit(f, key, lam, n=40, reps=3):
    """Fold n fresh-key draws into ONE jitted program (tunnel memoizes
    identical (executable, inputs) calls; see docs/PERFORMANCE.md).
    Repeat with fresh keys and keep the median (the tunnel occasionally
    completes a call asynchronously and reports ~dispatch-only wall time)."""
    def many(keys, x):
        def body(acc, k):
            return acc + f(k, x), None
        out, _ = jax.lax.scan(body, jnp.zeros_like(x), keys)
        return out

    g = jax.jit(many)
    jax.block_until_ready(g(jax.random.split(key, n), lam))
    times = []
    for r in range(reps):
        keys = jax.random.split(jax.random.fold_in(key, r + 1), n)
        t0 = time.perf_counter()
        jax.block_until_ready(g(keys, lam))
        times.append((time.perf_counter() - t0) / n)
    return sorted(times)[len(times) // 2]


def main():
    key = jax.random.key(RUN_SEED)
    lam = jax.block_until_ready(make_lam(key))
    npix = lam.size

    for name, fn in [
        ("poisson_pallas (flat full sampler)",
         lambda k, x: poisson_pallas(k, x)),
        ("poisson_rows_tiered br=32", lambda k, x: poisson_rows_tiered(k, x)),
        ("poisson_rows_tiered br=64",
         lambda k, x: poisson_rows_tiered(k, x, block_rows=64)),
        ("poisson_rows_tiered br=128",
         lambda k, x: poisson_rows_tiered(k, x, block_rows=128)),
        ("poisson_rows_tiered br=256",
         lambda k, x: poisson_rows_tiered(k, x, block_rows=256)),
        ("copy (xla baseline)", lambda k, x: x + 1.0),
    ]:
        dt = timeit(fn, key, lam)
        print(f"{name:42s} {dt * 1e3:8.3f} ms  "
              f"{npix / dt / 1e9:7.2f} Gpix/s")


if __name__ == "__main__":
    main()
