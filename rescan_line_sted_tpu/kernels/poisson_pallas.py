"""Pallas TPU Poisson sampler on the hardware PRNG.

``jax.random.poisson`` is compute-bound on TPU: every rejection-loop round
burns a Threefry2x32 evaluation (~40 VPU ops per uniform). This kernel draws
uniforms from the TPU's hardware PRNG (``pltpu.prng_random_bits``, ~free) and
runs a fixed-iteration, fully-vectorized sampler:

* lambda < 10: Knuth inversion by multiplication -- count how long a running
  product of uniforms stays above ``exp(-lam)``; 24 fixed rounds (truncation
  probability < 5e-5 at lambda = 10).
* lambda >= 10: Hormann's PTRS transformed rejection -- up to 10 vectorized
  attempts, first acceptance kept (residual non-acceptance ~1e-10 falls back
  to round(lambda)); ``log k!`` via a 2-term Stirling series (boundary error
  < 1e-4 in the log-acceptance test).

Both branches are evaluated and selected elementwise (no data-dependent
control flow). Sampling is deterministic in the provided seed; statistical
correctness is validated in tests (mean/variance/chi-square against the
exact pmf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CUT = 10.0          # branch threshold
_KNUTH_ROUNDS = 24   # fixed rounds for the small-lambda branch
_PTRS_ROUNDS = 10    # fixed attempts for the large-lambda branch
_HALF_LN_2PI = 0.9189385332046727


def _uniform(shape):
    """Uniform (0, 1) f32 from hardware random bits (never exactly 0).

    The bitcast to uint32 is essential: prng_random_bits yields i32 and a
    plain ``>>`` would sign-extend, making half the "uniforms" negative.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uint32 -> f32 casts are unsupported in Mosaic; after >> 9 the value
    # fits in 23 bits, so reinterpret as (positive) int32 first.
    small = pltpu.bitcast(bits >> 9, jnp.int32)
    return small.astype(jnp.float32) * (1.0 / (1 << 23)) + (0.5 / (1 << 23))


def _stirling_lgamma(z):
    """ln Gamma(z) for z >= 1 via a 2-term Stirling series."""
    return ((z - 0.5) * jnp.log(z) - z + _HALF_LN_2PI
            + 1.0 / (12.0 * z) - 1.0 / (360.0 * z * z * z))


def _uniform_planes(shape, rounds: int):
    """``rounds`` independent uniform planes of ``shape``, drawn in ONE
    ``prng_random_bits`` call.

    Per-call PRNG overhead dominates many-small-round samplers inside fused
    kernels (44 separate draws cost ~2x the whole sampler arithmetic);
    batching them into one [rounds*R, C] draw and slicing is ~2.2x faster
    end-to-end. Returns a closure ``u(k) -> plane k``.
    """
    rows, cols = shape
    all_u = _uniform((rounds * rows, cols))
    return lambda k: all_u[k * rows:(k + 1) * rows]


def _inversion(lam: jnp.ndarray, kmax: int) -> jnp.ndarray:
    """Single-uniform CDF-inversion Poisson for small lambda.

    ``N = #{k in [0, kmax) : u > F(k)}`` with ``F`` the Poisson CDF --
    exact given the uniform (P(N = j) = p_j by construction), truncated
    at ``kmax`` with P(true N > kmax) the tier's documented bound (the
    excess mass collapses onto ``kmax``, the same semantics as Knuth's
    fixed-round cap). Versus the Knuth product method this costs ONE
    hardware-PRNG word per pixel instead of one per round, and ~5 VPU
    ops per CDF term (two muls, add, compare, add) instead of ~7 per
    round -- at the bench configs the sampler tier work is the dominant
    per-step term (docs/PERFORMANCE.md 2048^2 roofline), and every
    sub-block sits at rates < 0.3 where a handful of CDF terms suffice
    (scripts/perf_tier_mix.py).

    f32 CDF accumulation error (~1e-7/term) only perturbs decision
    boundaries by ~2^-23 of probability mass -- far below the tiers'
    5e-5 truncation budget; statistics validated on hardware in
    tests/test_poisson_kernel.py.
    """
    return _inversion_from_uniform(_uniform(lam.shape), lam, kmax)


def _inversion_from_uniform(u: jnp.ndarray, lam: jnp.ndarray,
                            kmax: int) -> jnp.ndarray:
    """The inversion core as a pure function of the uniform: the Poisson
    quantile function N(u) = #{k < kmax : u > F(k)} -- split out so CPU
    tests can verify exactness against the pmf on a deterministic grid of
    uniforms (tests/test_poisson_kernel.py) without the hardware PRNG."""
    term = jnp.exp(-lam)                       # p_0
    cdf = term
    n = jnp.zeros(lam.shape, jnp.float32)
    for k in range(kmax):
        n = n + (u > cdf).astype(jnp.float32)
        if k + 1 < kmax:
            term = term * (lam * (1.0 / (k + 1)))   # p_{k+1}
            cdf = cdf + term
    return n


def _knuth(lam: jnp.ndarray, rounds: int, batched: bool = False
           ) -> jnp.ndarray:
    """Knuth product-method Poisson for small lambda, ``rounds`` unrolled.

    Statically unrolled: Mosaic cannot legalize scf.for with vector-mask
    carries. Truncation probability P(N > rounds): < 5e-5 at lambda = 10
    with 24 rounds, < 2e-6 at lambda = 1.5 with 10 rounds.
    """
    shape = lam.shape
    u = _uniform_planes(shape, rounds) if batched \
        else (lambda k: _uniform(shape))
    threshold = jnp.exp(-jnp.minimum(lam, _CUT + 1.0))
    prod = jnp.ones(shape, jnp.float32)
    small = jnp.zeros(shape, jnp.float32)
    for k in range(rounds):
        prod = prod * u(k)
        small = small + (prod >= threshold).astype(jnp.float32)
    return small


def sample_poisson(lam: jnp.ndarray, batched: bool = False) -> jnp.ndarray:
    """In-kernel Poisson draw from the hardware PRNG (Pallas TPU only).

    Pure vector code (no refs): callable from ANY Pallas kernel after
    ``pltpu.prng_seed`` -- the fused scan megakernels draw per-camera-frame
    shot noise with this without leaving VMEM. See the module doc for the
    Knuth/PTRS sampler derivation and its fixed-round error bounds.
    ``batched=True`` draws all rounds' bits in one PRNG call (see
    ``_uniform_planes``; costs ``44 * lam.size`` f32 of kernel stack, so use
    on small tiles only).
    """
    shape = lam.shape
    if batched:
        planes = _uniform_planes(shape, _KNUTH_ROUNDS + 2 * _PTRS_ROUNDS)
        ku = lambda k: planes(k)                      # noqa: E731
        pu = lambda r, j: planes(_KNUTH_ROUNDS + 2 * r + j)  # noqa: E731
    else:
        ku = lambda k: _uniform(shape)                # noqa: E731
        pu = lambda r, j: _uniform(shape)             # noqa: E731

    # --- small-lambda branch: Knuth product method -----------------------
    threshold = jnp.exp(-jnp.minimum(lam, _CUT + 1.0))
    prod = jnp.ones(shape, jnp.float32)
    small = jnp.zeros(shape, jnp.float32)
    for k in range(_KNUTH_ROUNDS):
        prod = prod * ku(k)
        small = small + (prod >= threshold).astype(jnp.float32)

    # --- large-lambda branch: PTRS transformed rejection ------------------
    lam_b = jnp.maximum(lam, _CUT - 1.0)
    log_lam = jnp.log(lam_b)
    b = 0.931 + 2.53 * jnp.sqrt(lam_b)
    a = -0.059 + 0.02483 * b
    vr = 0.9277 - 3.6224 / (b - 2.0)
    inv_alpha = 1.1239 + 1.1328 / (b - 3.4)

    large = jnp.round(lam_b)
    done = jnp.zeros(shape, jnp.float32)  # f32 mask: i1 carries upset Mosaic
    for r in range(_PTRS_ROUNDS):
        u = pu(r, 0) - 0.5
        v = pu(r, 1)
        us = 0.5 - jnp.abs(u)
        k = jnp.floor((2.0 * a / us + b) * u + lam_b + 0.43)
        accept_fast = (us >= 0.07) & (v <= vr)
        reject = (k < 0.0) | ((us < 0.013) & (v > us))
        safe_us = jnp.maximum(us, 1e-6)
        lhs = jnp.log(v * inv_alpha / (a / (safe_us * safe_us) + b))
        rhs = -lam_b + k * log_lam - _stirling_lgamma(
            jnp.maximum(k, 0.0) + 1.0)
        accept = (accept_fast | ((~reject) & (lhs <= rhs))).astype(jnp.float32)
        take = accept * (1.0 - done)
        large = take * k + (1.0 - take) * large
        done = jnp.maximum(done, accept)

    out = jnp.where(lam < _CUT, small, large)
    # lam * 0.0 (not literal 0.0): propagates NaN rates instead of masking
    # them to zero, so a poisoned frame is visible downstream.
    return jnp.where(lam > 0.0, out, lam * 0.0)


# CDF-inversion tier ladder: (upper rate bound, CDF terms). Each cell's
# truncation P(Poisson(hi) > kmax) stays under the 5e-5 budget shared with
# sample_poisson's fixed rounds:
#   hi=0.10, k=3:  3.8e-6    hi=0.33, k=4:  2.3e-5
#   hi=0.85, k=6:  2.7e-5    hi=1.5,  k=8:  2.4e-5
#   hi=10,   k=24: 3.0e-5
# The ladder is deliberately fine below ~1: bench-config camera maxes sit
# at < 0.3 (scripts/perf_tier_mix.py), where the old 10-round Knuth tier
# overshot the needed work ~2.5x.
_INV_TIERS = ((0.1, 3), (0.33, 4), (0.85, 6), (1.5, 8), (_CUT, 24))


def store_poisson_tiered(out_ref, rows: slice, lam: jnp.ndarray,
                         seed) -> None:
    """Write ``Poisson(lam)`` into ``out_ref[rows, :]``, picking a sampler
    tier from the chunk's max lambda at RUNTIME (``pl.when`` predication --
    only the selected tier's instructions execute).

    Camera frames in a scanning microscope are mostly dark (the illumination
    line covers a few percent of the field), so a full Knuth+PTRS draw on
    every pixel wastes ~90% of the VPU work. Tiers:

    * max <= 0:   exact zeros, no PRNG at all (Poisson(0) = 0; beyond the
      illumination envelope the f32 rates are exactly zero, which is the
      MAJORITY of a scanning-microscope frame);
    * max < 1e-3: one-uniform Bernoulli (P(N >= 2) <= 5e-7 per pixel);
    * max < 10:   single-uniform CDF inversion (``_inversion``) on the
      ``_INV_TIERS`` ladder -- term count graded to the sub-block max so
      the VPU work tracks the actual rates (truncation < 5e-5 per cell,
      table above);
    * else:       full Knuth+PTRS (exact branch selection per pixel).

    ``RLS_INV_SAMPLER=0`` restores the r4 Knuth ladder (10 rounds < 1.5,
    24 rounds < 10) for A/B measurement (scripts/perf_sampler_ab.py).

    Each tier seeds the hardware PRNG itself with ``seed`` (a scalar or a
    tuple of scalars -- tuples widen the effective seed space past 31 bits,
    see ``pltpu.prng_seed``), so the result is deterministic in
    (seed, chunk) regardless of which tier runs (the zero tier's output is 0
    either way -- bit-identical to running Bernoulli). The bright tier is a
    catch-all for non-finite max rates: a NaN lambda fails every ordered
    comparison, and without the catch-all the block would be left unwritten
    (uninitialized VMEM) instead of propagating the NaN.
    """
    import os

    seeds = seed if isinstance(seed, tuple) else (seed,)
    mx = jnp.max(lam)

    @pl.when(mx <= 0.0)
    def _zero():
        out_ref[rows, :] = jnp.zeros(lam.shape, jnp.float32)

    @pl.when((mx > 0.0) & (mx < 1e-3))
    def _dark():
        pltpu.prng_seed(*seeds)
        out_ref[rows, :] = (_uniform(lam.shape) < lam).astype(jnp.float32)

    if os.environ.get("RLS_INV_SAMPLER", "1") != "0":
        lo = 1e-3
        for hi, kmax in _INV_TIERS:
            @pl.when((mx >= lo) & (mx < hi))
            def _inv(kmax=kmax):
                pltpu.prng_seed(*seeds)
                out_ref[rows, :] = _inversion(lam, kmax)

            lo = hi
    else:
        @pl.when((mx >= 1e-3) & (mx < 1.5))
        def _dim():
            pltpu.prng_seed(*seeds)
            out_ref[rows, :] = _knuth(lam, 10, batched=True)

        @pl.when((mx >= 1.5) & (mx < _CUT))
        def _mid():
            pltpu.prng_seed(*seeds)
            out_ref[rows, :] = _knuth(lam, _KNUTH_ROUNDS, batched=True)

    @pl.when((mx >= _CUT) | jnp.isnan(mx))
    def _bright():
        pltpu.prng_seed(*seeds)
        out_ref[rows, :] = sample_poisson(lam, batched=True)


def _poisson_kernel(seed_ref, lam_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
    out_ref[...] = sample_poisson(lam_ref[...])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _poisson_flat(seed: jnp.ndarray, lam2d: jnp.ndarray, block_rows: int,
                  interpret: bool) -> jnp.ndarray:
    rows, cols = lam2d.shape
    grid = rows // block_rows
    return pl.pallas_call(
        _poisson_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, cols), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, cols), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seed, lam2d)


def _poisson_rows_kernel(seed_ref, lam_ref, out_ref, *, cr: int):
    """Tier-dispatch ``cr``-row sub-chunks of one (block_rows, block_cols)
    block: big blocks amortize the per-grid-step overhead, the fine
    sub-chunk granularity keeps the dark-tier skipping effective. Slicing
    the ref per sub-chunk (rather than reading the whole block as one SSA
    value) bounds the sampler temporaries' liveness on the Mosaic kernel
    stack (docs/PERFORMANCE.md)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_sub = lam_ref.shape[0] // cr
    base = (i * pl.num_programs(1) + j) * n_sub
    for k2 in range(n_sub):
        rows = slice(k2 * cr, (k2 + 1) * cr)
        store_poisson_tiered(out_ref, rows, lam_ref[rows, :],
                             (seed_ref[0], seed_ref[1] + base + k2))


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "block_cols", "sub_rows",
                                    "interpret"))
def _poisson_rows(seed: jnp.ndarray, lam2d: jnp.ndarray, block_rows: int,
                  block_cols: int, sub_rows: int,
                  interpret: bool) -> jnp.ndarray:
    rows, cols = lam2d.shape
    return pl.pallas_call(
        functools.partial(_poisson_rows_kernel, cr=sub_rows),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // block_rows, cols // block_cols),
            in_specs=[pl.BlockSpec((block_rows, block_cols),
                                   lambda i, j, s: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, block_cols),
                                   lambda i, j, s: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seed, lam2d)


def poisson_rows_tiered(key: jax.Array, lam: jnp.ndarray,
                        interpret: bool | None = None,
                        block_rows: int = 32,
                        block_cols: int | None = None,
                        sub_rows: int = 32) -> jnp.ndarray:
    """Poisson counts with sampler-tier dispatch per ``sub_rows``-row
    sub-chunk (TPU).

    Layout-aware fast path for mostly-dark rates: the last two axes are
    tiled into ``(block_rows, <=512)`` DMA blocks; inside each block every
    ``(sub_rows, block_cols)`` sub-chunk picks its sampler tier from its
    own max(lambda) at runtime (``store_poisson_tiered``) -- dark
    sub-chunks cost one hardware-PRNG uniform per pixel instead of the
    full 44-round Knuth+PTRS draw, while the large blocks amortize the
    per-grid-step overhead.

    Callers should arrange ``lam`` so brightness is localized in contiguous
    *rows* of the trailing 2D planes (e.g. W-major transposed camera frames,
    where the illumination stripe spans a few rows); with brightness smeared
    across every sub-chunk this degrades gracefully to ``poisson_pallas``
    speed. Deterministic in (``key``, shape, blocking); off TPU falls back
    to ``jax.random.poisson``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return jax.random.poisson(key, jnp.maximum(lam, 0.0)).astype(
            jnp.float32)
    # Two independent 31-bit words seed the hardware PRNG (prng_seed folds
    # all arguments), so chunk-seed collisions need a ~2^62 coincidence, not
    # the ~1e-5-per-acquisition chance a single 31-bit draw would give.
    seed = jax.random.randint(key, (2,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    # Clamp like the off-TPU fallback: band-limited means can carry tiny
    # negative excursions and both backends must agree on them.
    lam = jnp.maximum(jnp.asarray(lam, jnp.float32), 0.0)
    *lead, r, c = lam.shape
    lam2d = lam.reshape(-1, c)
    rows = lam2d.shape[0]
    block_rows = min(block_rows, _round_up(rows, sub_rows))
    block_rows = _round_up(block_rows, sub_rows)
    rpad = _round_up(rows, block_rows)
    cpad = _round_up(c, 128)
    if block_cols is None:
        block_cols = 512 if cpad % 512 == 0 else (256 if cpad % 256 == 0
                                                  else 128)
    else:
        cpad = _round_up(cpad, block_cols)
    if (rpad, cpad) != lam2d.shape:
        lam2d = jnp.zeros((rpad, cpad), jnp.float32).at[:rows, :c].set(lam2d)
    out = _poisson_rows(seed, lam2d, block_rows, block_cols, sub_rows, False)
    return out[:rows, :c].reshape(lam.shape)


def poisson_pallas(key: jax.Array, lam: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Poisson counts (f32) with the same call shape as jax.random.poisson.

    Deterministic in ``key``. TPU only: the interpreter implements
    ``prng_random_bits`` as zeros, so off-TPU this transparently falls back
    to ``jax.random.poisson`` (statistics validated on hardware in
    ``tests/test_poisson_kernel.py`` and ``scripts``-level TPU runs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return jax.random.poisson(key, jnp.maximum(lam, 0.0)).astype(
            jnp.float32)
    seed = jax.random.randint(key, (2,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    lam = jnp.maximum(jnp.asarray(lam, jnp.float32), 0.0)
    n = lam.size
    # Block at 128x1024 f32 (0.5 MB): the unrolled sampler keeps several
    # temporaries live per block and 256-row blocks brushed the 16 MB scoped
    # VMEM ceiling on some program shapes.
    if n >= (1 << 20):
        cols, block_rows = 1024, 128
    else:
        cols, block_rows = 128, 8
    padded = _round_up(n, block_rows * cols)
    flat = jnp.zeros((padded,), jnp.float32).at[:n].set(lam.ravel())
    out = _poisson_flat(seed, flat.reshape(-1, cols), block_rows, interpret)
    return out.ravel()[:n].reshape(lam.shape)
