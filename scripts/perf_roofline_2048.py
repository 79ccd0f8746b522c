"""Stage-ladder roofline for the 2048^2 per-step-noise rescan cell
(VERDICT r3 weak #1 / next-round item 1).

The BENCH `rescan_per_step_2048_fractional_R` entry (R=1.5 -> q=2 b=1
rational classes, banded fused megakernel) measured 35.7k steps/s in r3
vs 139.5k collapsed -- this script decomposes the gap with the kernel's
diagnostic stage knob (``RLS_BANDED_STAGE``, trace-time):

* ``conv``   -- conv matmul only (sampler + placement loops skipped)
* ``loop``   -- + the sampler loop machinery (slice/max/seed/branches)
                 with every tier predicated off
* ``sample`` -- + the real tier work (full sampler, no placement loop)
* ``place``  -- conv + placement loop, no sampler (the collapsed path)
* ``full``   -- the shipping per-step engine

All timings use the honest amortized harness (n iterations folded into
one jitted lax.scan, key-perturbed sample, in-jit checksum, run-unique
keys). Also sweeps the chunk size (32 vs 64) for the full engine.

``--matrix`` instead runs the r4 lane-tile x sampler-sub-row retune
matrix (RLS_BANDED_LANE x RLS_BANDED_SUB_ROWS over the shipping engine at
2048^2 and 512^2, plus the rDFT-hybrid comparison row at 512^2), with
noise-free parity vs the exact engine asserted at every cell -- the
numbers behind the routing retune and the removed r3 width gate
(docs/PERFORMANCE.md "2048^2 per-step roofline").

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_roofline_2048.py [--matrix]
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

# bench_large_fov_per_step config (bench.py LINE_KW)
LINE_KW = dict(sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0,
               slit_halfwidth=4.0, brightness=1.0)


def timed(name, body, sample, out_shape, size, n=3):
    def outer(s, keys):
        def step(acc, k):
            s_k = s * (1.0 + 1e-6 * jax.random.uniform(k))
            return acc + body(s_k, k), None
        out, _ = jax.lax.scan(step, jnp.zeros(out_shape, jnp.float32), keys)
        return jnp.sum(out)

    f = jax.jit(outer)
    jax.block_until_ready(f(sample, jax.random.split(
        jax.random.key(RUN_SEED + hash(name) % 10000), n)))
    best = 1e30
    for r in range(3):
        keys = jax.random.split(
            jax.random.key(RUN_SEED + hash(name) % 10000 + 1 + r), n)
        t0 = time.perf_counter()
        float(f(sample, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms/img = {size/best:,.0f} steps/s",
          flush=True)
    return best


def run_ladder():
    results = {}
    for size in [2048, 512]:
        sample = samples.siemens_star((size, size))
        params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
        for chunk in ([32, 64] if size == 2048 else [32]):
            geom = RescanGeometry(Grid(size, size), rescan_factor=1.5,
                                  chunk=chunk)
            shape = geom.canvas_shape
            print(f"--- {size}^2, R=1.5 (q=2, b=1), chunk={chunk}, "
                  "per-step noise ---")
            stages = (["conv", "loop", "sample", "place", "full"]
                      if chunk == 32 else ["full"])
            for stage in stages:
                os.environ["RLS_BANDED_STAGE"] = stage
                # use_pallas=True pins the banded route at every width/stage
                results[(size, chunk, stage)] = timed(
                    f"stage={stage}",
                    lambda s, k: rescanned_line_sted_image(
                        s, params, geom, key=k, method="scan",
                        noise_mode="per_step", use_pallas=True).image,
                    sample, shape, size)
            os.environ.pop("RLS_BANDED_STAGE", None)
    
    for size in [2048, 512]:
        key = lambda st: results.get((size, 32, st))
        if key("full") is None:
            continue
        conv, loop, samp, place, full = (key(s) for s in
                                         ("conv", "loop", "sample", "place",
                                          "full"))
        print(f"=== {size}^2 ladder (ms/img) ===")
        print(f"conv+overhead floor : {conv*1e3:8.2f}")
        print(f"sampler loop machinery: +{(loop-conv)*1e3:7.2f}")
        print(f"sampler tier work   : +{(samp-loop)*1e3:7.2f}")
        print(f"placement loop      : +{(full-samp)*1e3:7.2f} "
              f"(collapsed-path cross-check: place-conv = "
              f"{(place-conv)*1e3:.2f})")
        print(f"full                : {full*1e3:8.2f} = {size/full:,.0f} steps/s")


def run_matrix():
    import itertools

    import numpy as np

    for size, lanes in [(2048, (128, 256, 512)), (512, (128, 256))]:
        geom = RescanGeometry(Grid(size, size), rescan_factor=1.5, chunk=32)
        sample = samples.siemens_star((size, size))
        params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
        shape = geom.canvas_shape
        prev = os.environ.get("RLS_BANDED_FUSED")
        os.environ["RLS_BANDED_FUSED"] = "0"
        try:
            exact = np.asarray(rescanned_line_sted_image(
                sample, params, geom, method="scan",
                use_pallas=False).image, np.float64)
        finally:
            if prev is None:
                os.environ.pop("RLS_BANDED_FUSED", None)
            else:
                os.environ["RLS_BANDED_FUSED"] = prev
        for lane, sub in itertools.product(lanes, (32, 128)):
            os.environ["RLS_BANDED_LANE"] = str(lane)
            os.environ["RLS_BANDED_SUB_ROWS"] = str(sub)
            try:
                got = np.asarray(rescanned_line_sted_image(
                    sample, params, geom, method="scan",
                    use_pallas=True).image, np.float64)
                rel = np.abs(got - exact).max() / np.abs(exact).max()
                assert rel < 1e-4, (size, lane, sub, rel)
                timed(f"{size}^2 lane={lane} sub={sub} "
                      f"(parity {rel:.1e})",
                      lambda s, k: rescanned_line_sted_image(
                          s, params, geom, key=k, method="scan",
                          noise_mode="per_step", use_pallas=True).image,
                      sample, shape, size)
            finally:
                os.environ.pop("RLS_BANDED_LANE", None)
                os.environ.pop("RLS_BANDED_SUB_ROWS", None)
        if size == 512:
            timed("512^2 rDFT hybrid (use_pallas=False)",
                  lambda s, k: rescanned_line_sted_image(
                      s, params, geom, key=k, method="scan",
                      noise_mode="per_step", use_pallas=False).image,
                  sample, shape, size)


if __name__ == "__main__":
    if "--matrix" in sys.argv:
        run_matrix()
    else:
        run_ladder()
