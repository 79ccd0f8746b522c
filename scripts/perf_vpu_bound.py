"""Hardware-primitive rates for the de-circularized composite bound.

The r4 composite bound's sampler term was a measurement of the engine's
own sampler stage (r4 VERDICT weak #5: "93% of bound" partly meant "93%
of what it already does"). This script measures each primitive the
per-step engine is built from in a MINIMAL standalone Pallas kernel --
one repeated op on one resident [128, 512] f32 block, nothing resembling
the engine's loop structure -- so the bound becomes

    T >= conv_MACs / mxu  +  sum_tier px * (uniform + kmax * inv_term
                                            + exp) / rate
         + placement_windows * roll_add_cost

with every count algebraic (scripts/perf_tier_mix.py) and every rate a
hardware primitive. Primitives:

* ``fma``          -- peak dependent-chain f32 multiply-add (VPU ceiling)
* ``uniform``      -- hardware-PRNG word drawn AND prepped to (0,1) f32
                      (``poisson_pallas._uniform``: bits >> 9, bitcast,
                      cast, scale)
* ``exp``          -- ``jnp.exp`` per element (tier setup: ``e^-lam``)
* ``inv_term``     -- one CDF-inversion term (2 muls, add, compare, add)
* ``knuth_round``  -- one legacy Knuth round (uniform prep + mul + cmp +
                      add) for the r4 A/B
* ``roll_add``     -- ``pltpu.roll`` + accumulate of one [W_PAD, 512]
                      window (the placement primitive)
* ``mxu``          -- [4096, 128] @ [128, 512] f32 HIGHEST matmul
                      (the conv stage's unit; grounds the 197/6 TFLOP/s
                      bf16x6 figure empirically)

Loop bodies chain through a VMEM scratch ref (the established Mosaic
pattern; vector carries in scf.for do not legalize), with 16 chained ops
per ref round-trip so the load/store amortizes.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_vpu_bound.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rescan_line_sted_tpu.utils.observability import enable_compilation_cache

ROWS, COLS = 128, 512
PX = ROWS * COLS
UNROLL = 16


def _uniform(shape):
    # poisson_pallas._uniform, inlined so this file stands alone
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    small = pltpu.bitcast(bits >> 9, jnp.int32)
    return small.astype(jnp.float32) * (1.0 / (1 << 23)) + (0.5 / (1 << 23))


def _fresh_seed():
    # run-unique inputs: the axon tunnel memoizes (executable, inputs) ->
    # results ACROSS processes, so a repeated seed returns the cached
    # result in dispatch-only time and the "rate" is fiction
    return jnp.asarray([int.from_bytes(os.urandom(3), "little"),
                        int.from_bytes(os.urandom(3), "little")], jnp.int32)


def _bench(kernel, reps, scratches, grid=64, unit_per_rep=PX, n_timing=3,
           out_shape=(ROWS, COLS), t_outer=16):
    """Best-of wall time per primitive op.

    ``t_outer`` pallas_calls are folded into ONE jitted ``lax.scan`` with
    a summed checksum (docs/PERFORMANCE.md / the verify recipe: isolated
    tiny programs on this tunnel return in dispatch-only wall time even
    with fresh inputs; only engine-level scans time reliably)."""
    f = pl.pallas_call(
        functools.partial(kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[],
            out_specs=pl.BlockSpec(out_shape, lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in scratches],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    def outer(seed):
        def step(acc, i):
            return acc + jnp.sum(f(seed + i)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(t_outer, dtype=jnp.int32))
        return acc

    g = jax.jit(outer)
    # float(...) fetches the VALUE: on the axon tunnel block_until_ready
    # alone returns in dispatch time (bench.py's fencing discipline)
    float(g(_fresh_seed()))
    best = 1e30
    for _ in range(n_timing):
        s = _fresh_seed()
        t0 = time.perf_counter()
        float(g(s))
        best = min(best, time.perf_counter() - t0)
    return t_outer * grid * reps * unit_per_rep / best, best


def _k_fma(seed_ref, out_ref, s_ref, *, reps: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_ref[:] = jnp.full((ROWS, COLS), 0.5, jnp.float32)

    def body(i, _):
        x = s_ref[...]
        for _ in range(UNROLL):
            x = x * 0.999999 + 1e-7
        s_ref[...] = x
        return 0

    jax.lax.fori_loop(0, reps // UNROLL, body, 0)
    out_ref[...] = s_ref[...]


def _k_uniform(seed_ref, out_ref, s_ref, *, reps: int):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_ref[:] = jnp.zeros((ROWS, COLS), jnp.float32)

    def body(i, _):
        x = s_ref[...]
        for _ in range(UNROLL):
            x = x + _uniform((ROWS, COLS))
        s_ref[...] = x
        return 0

    jax.lax.fori_loop(0, reps // UNROLL, body, 0)
    out_ref[...] = s_ref[...]


def _k_exp(seed_ref, out_ref, s_ref, *, reps: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_ref[:] = jnp.full((ROWS, COLS), 0.3, jnp.float32)

    def body(i, _):
        x = s_ref[...]
        for _ in range(UNROLL):
            x = jnp.exp(-x) * 0.5
        s_ref[...] = x
        return 0

    jax.lax.fori_loop(0, reps // UNROLL, body, 0)
    out_ref[...] = s_ref[...]


def _k_inv_term(seed_ref, out_ref, term_ref, cdf_ref, n_ref, *, reps: int):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        term_ref[:] = jnp.full((ROWS, COLS), 0.7, jnp.float32)
        cdf_ref[:] = jnp.full((ROWS, COLS), 0.7, jnp.float32)
        n_ref[:] = jnp.zeros((ROWS, COLS), jnp.float32)

    u = _uniform((ROWS, COLS))
    lam = jnp.full((ROWS, COLS), 0.3, jnp.float32)

    def body(i, _):
        term, cdf, n = term_ref[...], cdf_ref[...], n_ref[...]
        for k in range(UNROLL):
            # one inversion term, exactly as _inversion_from_uniform's
            # loop body: n += (u > cdf); term *= lam * c; cdf += term
            n = n + (u > cdf).astype(jnp.float32)
            term = term * (lam * (1.0 / (k + 1)))
            cdf = cdf + term
        term_ref[...], cdf_ref[...], n_ref[...] = term, cdf, n
        return 0

    jax.lax.fori_loop(0, reps // UNROLL, body, 0)
    out_ref[...] = n_ref[...] + cdf_ref[...]


def _k_knuth_round(seed_ref, out_ref, prod_ref, small_ref, *, reps: int):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        prod_ref[:] = jnp.ones((ROWS, COLS), jnp.float32)
        small_ref[:] = jnp.zeros((ROWS, COLS), jnp.float32)

    threshold = jnp.full((ROWS, COLS), np.exp(-0.3), jnp.float32)

    def body(i, _):
        prod, small = prod_ref[...], small_ref[...]
        for _ in range(UNROLL):
            prod = prod * _uniform((ROWS, COLS))
            small = small + (prod >= threshold).astype(jnp.float32)
        prod_ref[...], small_ref[...] = prod, small
        return 0

    jax.lax.fori_loop(0, reps // UNROLL, body, 0)
    out_ref[...] = small_ref[...] + prod_ref[...]


W_PAD = 136  # the 2048^2 R=1.5 placement window (dob=128, 8-aligned + 8)


def _k_roll_add(seed_ref, out_ref, pad_ref, *, reps: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        pad_ref[:] = jnp.full((W_PAD, COLS), 1e-6, jnp.float32)
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        # the placement primitive: roll by a dynamic sub-8 residual and
        # accumulate at a dynamic 8-aligned base (rescan_banded_fused
        # _place/_add_at)
        base = pl.multiple_of(((i * 8) % (out_ref.shape[0] - W_PAD))
                              // 8 * 8, 8)
        out_ref[pl.ds(base, W_PAD), :] += pltpu.roll(pad_ref[...], i % 8, 0)
        return 0

    jax.lax.fori_loop(0, reps, body, 0)


def _k_mxu(seed_ref, out_ref, a_ref, b_ref, acc_ref, *, reps: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        a_ref[:] = jnp.full((4096, 128), 0.01, jnp.float32)
        b_ref[:] = jnp.full((128, COLS), 0.02, jnp.float32)
        acc_ref[:] = jnp.zeros((4096, COLS), jnp.float32)

    def body(i, _):
        # perturb the small operand so the dot is loop-variant (no LICM);
        # the [128, 512] add is ~64x cheaper than the matmul it guards
        acc_ref[...] += jnp.dot(a_ref[...], b_ref[...] + i * 1e-9,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, reps, body, 0)
    out_ref[...] = acc_ref[0:ROWS, :]


def composite_bound(res, size=2048, chunk=32):
    """Assemble the de-circularized per-step composite bound: every term
    is an algebraic count (scripts/perf_tier_mix.py, from the noise-free
    camera) divided by a hardware-primitive rate measured above. Replaces
    the r4 bound whose sampler term was the engine's own stage timing."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_tier_mix import tier_mix

    mix = tier_mix(size, chunk)
    t_conv = mix["conv_macs"] / res["mxu_macs_per_s"]
    t_sampler = (mix["sampled_px"] / res["uniform_px_per_s"]
                 + mix["sampled_px"] / res["exp_px_per_s"]
                 + mix["inv_term_px"] / res["inv_term_px_per_s"])
    t_place = mix["placement_windows"] / res["roll_add_windows_per_s"]
    total = t_conv + t_sampler + t_place
    bound = dict(
        size=size, chunk=chunk,
        conv_ms=t_conv * 1e3, sampler_ms=t_sampler * 1e3,
        placement_ms=t_place * 1e3, total_ms=total * 1e3,
        steps_per_s_bound=size / total,
        derivation=(
            f"conv {mix['conv_macs']/1e9:.1f} GMAC / "
            f"{res['mxu_macs_per_s']/1e12:.2f} TMAC/s + sampler "
            f"({mix['sampled_px']/1e6:.0f} Mpx uniform+exp + "
            f"{mix['inv_term_px']/1e6:.0f} M inv terms) + "
            f"{mix['placement_windows']} roll+add windows; every count "
            "algebraic (perf_tier_mix), every rate a standalone-kernel "
            "primitive (perf_vpu_bound)"))
    print(f"\ncomposite bound {size}^2 chunk={chunk}:")
    print(f"  conv      {bound['conv_ms']:7.2f} ms")
    print(f"  sampler   {bound['sampler_ms']:7.2f} ms")
    print(f"  placement {bound['placement_ms']:7.2f} ms")
    print(f"  total     {bound['total_ms']:7.2f} ms = "
          f"{bound['steps_per_s_bound']:,.0f} steps/s")
    print("COMPOSITE_BOUND " + json.dumps(bound))
    return bound


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    print("backend:", jax.devices()[0])
    res = {}

    rate, t = _bench(_k_fma, 4096, [(ROWS, COLS)])
    res["fma_px_per_s"] = rate
    print(f"fma         : {rate/1e9:8.1f} G ops/s   ({t*1e3:.2f} ms)")

    rate, t = _bench(_k_uniform, 2048, [(ROWS, COLS)])
    res["uniform_px_per_s"] = rate
    print(f"uniform     : {rate/1e9:8.1f} G words/s ({t*1e3:.2f} ms)")

    rate, t = _bench(_k_exp, 2048, [(ROWS, COLS)])
    res["exp_px_per_s"] = rate
    print(f"exp         : {rate/1e9:8.1f} G exps/s  ({t*1e3:.2f} ms)")

    rate, t = _bench(_k_inv_term, 2048,
                     [(ROWS, COLS), (ROWS, COLS), (ROWS, COLS)])
    res["inv_term_px_per_s"] = rate
    print(f"inv_term    : {rate/1e9:8.1f} G terms/s ({t*1e3:.2f} ms)")

    rate, t = _bench(_k_knuth_round, 2048, [(ROWS, COLS), (ROWS, COLS)])
    res["knuth_round_px_per_s"] = rate
    print(f"knuth_round : {rate/1e9:8.1f} G rnds/s  ({t*1e3:.2f} ms)")

    rate, t = _bench(_k_roll_add, 2048, [(W_PAD, COLS)],
                     unit_per_rep=1, out_shape=(3080, COLS))
    res["roll_add_windows_per_s"] = rate
    res["roll_add_px_per_s"] = rate * W_PAD * COLS
    print(f"roll_add    : {rate/1e6:8.2f} M windows/s "
          f"({rate*W_PAD*COLS/1e9:.1f} G px/s, {t*1e3:.2f} ms)")

    rate, t = _bench(_k_mxu, 256, [(4096, 128), (128, COLS), (4096, COLS)],
                     unit_per_rep=4096 * 128 * COLS, grid=8)
    res["mxu_macs_per_s"] = rate
    print(f"mxu f32 HI  : {rate*2/1e12:8.2f} TFLOP/s  ({t*1e3:.2f} ms)")

    print("VPU_BOUND " + json.dumps(res))
    if "--bound" in sys.argv:
        composite_bound(res)


if __name__ == "__main__":
    main()
