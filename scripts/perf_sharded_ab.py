"""Sharded banded-fused engine: hardware parity drive + A/B vs the
documented GSPMD route (r3 VERDICT item 3).

On the single real chip a 1-device "space" mesh exercises the full
shard_map machinery (halo ppermute ring, per-device pallas_call, concat
epilogue) with the same per-device program a multi-chip mesh would run --
per-device throughput is what scales, so the A/B is representative modulo
the (tiny, S_det-row) halo transfer:

* parity: shard_map engine vs the direct banded engine (must be exact up
  to the halo-truncated y-conv tail, < ~1e-9) and vs the exact rDFT
  engine;
* per-step noise: distributional parity (total within shot noise of the
  noise-free expectation, residual power matching Poisson Var = mean);
* A/B: steps/s of (a) the shard_map banded engine, (b) the direct banded
  engine (shard_map overhead), (c) the documented sharded route
  ``use_pallas=False`` (the XLA scan path a sharded sample used to be
  forced onto).

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sharded_ab.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rescan_line_sted_tpu.config import Grid, LineSTEDParams, RescanGeometry
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
from rescan_line_sted_tpu.parallel import make_mesh, replicate
from rescan_line_sted_tpu.parallel.sharded_rescan import (
    rescanned_line_sted_sharded,
)
from rescan_line_sted_tpu.utils.observability import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), jax.devices())

SIZE = 512
LINE_KW = dict(sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0,
               slit_halfwidth=4.0, brightness=1.0)


def amortized_s(make_image, sample, params, out_shape, n=5, seed_off=0):
    """bench.py's honest harness (key-perturbed sample, in-jit checksum)."""
    def many(s, p, keys):
        def body(acc, k):
            s_k = s * (1.0 + 1e-6 * jax.random.uniform(k))
            return acc + make_image(s_k, p, k), None
        out, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32), keys)
        return jnp.sum(out)

    f = jax.jit(many)
    jax.block_until_ready(f(
        sample, params, jax.random.split(jax.random.key(RUN_SEED + seed_off),
                                         n)))
    best = 1e30
    for r in range(2):
        keys = jax.random.split(
            jax.random.key(RUN_SEED + seed_off + 1 + r), n)
        t0 = time.perf_counter()
        float(f(sample, params, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    mesh = make_mesh({"space": 1}, devices=jax.devices()[:1])
    geom = RescanGeometry(Grid(SIZE, SIZE), rescan_factor=1.5, chunk=32)
    sample = samples.siemens_star((SIZE, SIZE)) * 2.0
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    sample_sp = jax.device_put(sample, NamedSharding(mesh, P("space", None)))
    params_r = replicate(mesh, params)
    out = {"config": f"{SIZE}^2 R=1.5 chunk=32 q=2 b=1",
           "device": str(jax.devices()[0])}

    # --- parity (noise-free) ---
    got = np.asarray(jax.jit(lambda s, p: rescanned_line_sted_sharded(
        s, p, geom, mesh).image)(sample_sp, params_r), np.float64)
    want_banded = np.asarray(rescanned_line_sted_image(
        sample, params, geom, method="scan", use_pallas=True).image,
        np.float64)
    prev = os.environ.get("RLS_BANDED_FUSED")
    os.environ["RLS_BANDED_FUSED"] = "0"
    try:
        want_exact = np.asarray(rescanned_line_sted_image(
            sample, params, geom, method="scan", use_pallas=False).image,
            np.float64)
    finally:
        if prev is None:
            os.environ.pop("RLS_BANDED_FUSED", None)
        else:
            os.environ["RLS_BANDED_FUSED"] = prev
    out["rel_vs_banded"] = float(
        np.abs(got - want_banded).max() / np.abs(want_banded).max())
    out["rel_vs_exact"] = float(
        np.abs(got - want_exact).max() / np.abs(want_exact).max())
    ok = out["rel_vs_banded"] < 1e-5 and out["rel_vs_exact"] < 1e-4

    # --- per-step noise: distributional parity ---
    bright = params.replace(brightness=jnp.float32(300.0))
    bright_r = replicate(mesh, bright)
    expected = np.asarray(rescanned_line_sted_image(
        sample, bright, geom, method="scan", use_pallas=True).image,
        np.float64)
    noisy = np.asarray(jax.jit(lambda s, p, k: rescanned_line_sted_sharded(
        s, p, geom, mesh, key=k, noise_mode="per_step").image)(
        sample_sp, bright_r, jax.random.key(RUN_SEED)), np.float64)
    etotal = expected.sum()
    out["noise_z"] = float(abs(noisy.sum() - etotal) / np.sqrt(etotal))
    out["noise_chi2_ratio"] = float(((noisy - expected) ** 2).sum() / etotal)
    ok &= out["noise_z"] < 6.0 and 0.75 < out["noise_chi2_ratio"] < 1.3

    # --- A/B: per-step steps/s ---
    cshape = geom.canvas_shape
    t_shard = amortized_s(
        lambda s, p, k: rescanned_line_sted_sharded(
            s, p, geom, mesh, key=k, noise_mode="per_step").image,
        sample_sp, params_r, cshape, seed_off=11)
    t_direct = amortized_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan", noise_mode="per_step").image,
        sample, params, cshape, seed_off=23)
    t_gspmd = amortized_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan", noise_mode="per_step",
            use_pallas=False).image,
        sample_sp, params_r, cshape, seed_off=37)
    out["per_step_steps_per_sec"] = {
        "shard_map_banded": round(SIZE / t_shard, 1),
        "direct_banded": round(SIZE / t_direct, 1),
        "gspmd_use_pallas_false": round(SIZE / t_gspmd, 1),
    }
    out["passed"] = bool(ok)
    print("SHARDED_AB " + json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
