"""Benchmark harness: the BASELINE.json metrics on real hardware.

Measures, on the attached TPU chip:

1. **scan-steps/sec/chip** for the 2D line-STED *scan-path* simulation
   (the reference's per-scan-position hot loop, compiled as a lax.scan);
2. **end-to-end dose-matched point-vs-line sweep wall-clock** vs the CPU
   float64 numpy oracle (``tests/oracle``), which implements the reference's
   loop-per-scan-position algorithm -- the >=100x north-star denominator.

The oracle's point-STED cost is measured on a subset of scan positions and
scaled linearly (every step does identical-shape work); that extrapolation
is ANCHORED by one full, non-extrapolated oracle sweep at a small size,
whose measured/extrapolated agreement is reported
(``oracle_anchor_measured_over_extrapolated``). The loop-vs-loop number
(oracle per-step loop vs TPU scan path on the same algorithm) is reported
as ``scan_path_loop_vs_loop_x``.

Throughput methodology: per-call wall times through the axon tunnel carry a
large executable-dependent dispatch overhead (~2-30 ms), so scan throughput
is ALSO measured amortized -- N iterations folded into ONE jitted program
(lax.scan over N fresh keys) -- which is the honest device rate
(docs/PERFORMANCE.md). Both appear in details: ``*_steps_per_sec_chip``
(per-call, comparable with BENCH_r01) and ``*_device`` (amortized).

Prints TWO JSON lines: the full
{"metric", "value", "unit", "vs_baseline", "details"} record, then a
COMPACT summary line (headline + flagship device rates) printed last so a
front-truncating tail capture always ends with standalone-parseable
numbers (r4 VERDICT weak #2).
"""

import json
import os
import sys
import time

# Pin the oracle's BLAS/OpenMP threading BEFORE numpy loads: the oracle is
# the reference's single-threaded numpy profile (SURVEY.md section 1), and a
# fixed thread count keeps the anchor ratio stable against host contention
# with the tunnel client (VERDICT r2 item 5).
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np

sys.path.insert(0, ".")

# The axon tunnel memoizes (executable, inputs) -> result across processes;
# a rerun with fixed PRNG keys would be served from cache and report bogus
# timings. Every timed call gets a run-unique key derived from this seed.
RUN_SEED = int.from_bytes(os.urandom(4), "little")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rescan_line_sted_tpu.config import (  # noqa: E402
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
)
from rescan_line_sted_tpu.data import samples  # noqa: E402
from rescan_line_sted_tpu.imaging import line_sted_image  # noqa: E402
from rescan_line_sted_tpu.sweeps import dose_matched_sweep  # noqa: E402
from tests.oracle import oracle  # noqa: E402

# ---- benchmark configuration -------------------------------------------
SCAN_SIZE = 512          # line-STED scan benchmark grid
SWEEP_SIZE = 256         # dose-sweep grid (TPU and oracle, same shapes)
SWEEP_POWERS = 8         # sweep points
ORACLE_POINT_STEPS = 512   # oracle point-STED steps measured (of SIZE^2)
ORACLE_LINE_STEPS = 64     # oracle line-STED steps measured (of SIZE)

POINT_KW = dict(sigma_exc=3.0, sigma_det=3.0, sigma_dep=3.0,
                pinhole_radius=4.0, brightness=1.0)
LINE_KW = dict(sigma_exc=3.0, sigma_det=3.0, stripe_period=12.0,
               slit_halfwidth=4.0, brightness=1.0)

# Documented composite bounds (docs/PERFORMANCE.md; r3 VERDICT item 4).
# These are the attainable ceilings the rooflines derived -- update ONLY
# when a roofline is re-measured, so bound_fractions stay comparable
# round-over-round.
# r5: primitive-grounded bound (r4 VERDICT weak #5): every term is an
# algebraic count (scripts/perf_tier_mix.py, from the noise-free camera)
# times a hardware-primitive rate measured in a minimal standalone kernel
# (scripts/perf_vpu_bound.py --bound): conv 68.7 GMAC / 15.6 TMAC/s
# (measured f32-HIGHEST dot = the bf16x6 model) + sampler 537 Mpx
# x (uniform + exp) + 1993 M inversion terms + 8192 roll+add placement
# windows = 11.98 ms/img. Replaces the r4 26.04 ms bound whose dominant
# term was the engine's own sampler stage timing (partly circular).
BOUND_2048_PER_STEP = 2048 / 11.98e-3   # r5 primitive-grounded composite
HARNESS_FLOOR_S = 3.5e-3                # amortized-harness floor (r3 cont.)
# 512^2-class entries fold this many independent images into each timing
# iteration (see _amortized_image_s ``batch``), so the per-image harness
# floor is HARNESS_FLOOR_S / BATCH_512 and the rates are real compute
# measurements (r4 VERDICT weak #4).
BATCH_512 = 8


def _amortized_image_s(make_image, sample, params, out_shape, n=10,
                       seed_off=0, batch=1):
    """Device time per image: n iterations folded into ONE jitted program.

    Defeats both the tunnel's per-call dispatch overhead and its
    (executable, inputs) result memoization (fresh os.urandom-derived keys
    every run). ``params`` is threaded as a jit ARGUMENT: closure params
    are concrete, so tracing executes every PSF/circulant-construction op
    EAGERLY through the remote-compile tunnel -- one tiny tunnel compile
    per op, minutes of apparent "compile time" (docs/PERFORMANCE.md,
    "Tracing with closure params").

    ``batch`` > 1 folds B independent images (fresh sub-keys, statically
    unrolled -- unrolling composes with every engine, including the Pallas
    megakernels, where a vmap batching rule might not) into EACH scan
    iteration, so the ~3.5 ms/iteration amortized-harness floor
    (docs/PERFORMANCE.md) spreads to floor/B per image: 512^2-class
    entries then carry resolvable compute rates instead of
    ``harness_floor_dominated`` annotations (r4 VERDICT weak #4).
    """
    def many(s, p, keys):
        def body(acc, k):
            def one(acc, kk):
                # key-derived perturbation of the sample: the WHOLE
                # pipeline depends on kk, so XLA cannot hoist the
                # noise-free stages out of the loop (collapsed engines
                # otherwise measure only their final Poisson draw --
                # loop-invariant code motion; measured 2.5x inflation on
                # collapsed paths, docs/PERFORMANCE.md)
                s_k = s * (1.0 + 1e-6 * jax.random.uniform(kk))
                return acc + make_image(s_k, p, kk)
            if batch == 1:
                return one(acc, k), None
            kb = jax.random.split(k, batch)
            for i in range(batch):
                # accumulating through acc serializes the B pipelines --
                # deliberate: timing stays honest even if XLA would
                # otherwise overlap them
                acc = one(acc, kb[i])
            return acc, None
        out, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32), keys)
        # checksum INSIDE the jitted program: float() of the scalar then
        # forces the whole pipeline's VALUE with a 4-byte transfer. An
        # EAGER jnp.sum(out) here instead goes through the tunnel's slow
        # per-input eager-execution path (~1.3 s/call) and poisons the
        # timing (docs/PERFORMANCE.md).
        return jnp.sum(out)

    f = jax.jit(many)
    jax.block_until_ready(f(
        sample, params,
        jax.random.split(jax.random.key(RUN_SEED + seed_off), n)))
    best = 1e30
    for r in range(2):
        keys = jax.random.split(
            jax.random.key(RUN_SEED + seed_off + 1 + r), n)
        t0 = time.perf_counter()
        float(f(sample, params, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    return best / batch


def bench_scan_steps_per_sec(noise_mode: str, size: int = None):
    size = size or SCAN_SIZE
    grid = Grid(size, size)
    geom = LineSTEDGeometry(grid, chunk=32)
    sample = samples.siemens_star((size, size))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)

    # params as a jit ARGUMENT (not a closure): see _amortized_image_s.
    # The in-jit checksum gives per-call timing an honest 4-byte forcing
    # point (eager sums take the tunnel's slow path; block_until_ready on
    # the last call only would let the calls pipeline).
    fn = jax.jit(lambda s, p, k: jnp.sum(line_sted_image(
        s, p, geom, key=k, method="scan", noise_mode=noise_mode).image))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(sample, params, jax.random.key(RUN_SEED)))
    compile_s = time.perf_counter() - t0

    # per-call loop: force EVERY call via its in-jit scalar checksum (a
    # 4-byte transfer). Measured per-call behaviors on the tunnel: serial
    # forced = ~28 ms (honest dispatch+run); async pipelining can
    # pathologically serialize for some executables (1.7 s/call); an EAGER
    # jnp.sum force costs ~1.3 s/call. One untimed forced call first -- the
    # first force of a fresh executable carries a ~350 ms outlier.
    float(fn(sample, params, jax.random.key(RUN_SEED + 999)))
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(sample, params, jax.random.key(RUN_SEED + 1 + i)))
    dt = (time.perf_counter() - t0) / iters

    dev_dt = _amortized_image_s(
        lambda s, p, k: line_sted_image(s, p, geom, key=k, method="scan",
                                        noise_mode=noise_mode).image,
        sample, params, (size, size), seed_off=hash(noise_mode) % 1000,
        batch=BATCH_512 if size == SCAN_SIZE else 1)
    return size / dt, size / dev_dt, compile_s, dt


def bench_cold_compile():
    """Cache-bypassed cold lower+compile of the collapsed scan program.

    VERDICT r3 item 4: `compile_s` reflects the persistent cache once
    `.jax_cache` is warm, so round-over-round compile health was
    untracked. This measures a FRESH `jax.jit` wrapper with the
    persistent compilation cache disabled: `lower()` is the trace cost
    (the r3 eager-op-storm regression detector -- params as jit args keep
    it ~1 s) and `compile()` is the real XLA/tunnel compile.
    """
    prev = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        geom = LineSTEDGeometry(Grid(SCAN_SIZE, SCAN_SIZE), chunk=32)
        sample = samples.siemens_star((SCAN_SIZE, SCAN_SIZE))
        params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
        fn = jax.jit(lambda s, p, k: jnp.sum(line_sted_image(
            s, p, geom, key=k, method="scan").image))
        t0 = time.perf_counter()
        lowered = fn.lower(sample, params, jax.random.key(RUN_SEED + 777))
        lower_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        compile_s = time.perf_counter() - t0
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
    return lower_s, compile_s


def bench_rescan_steps_per_sec(noise_mode: str = "collapsed"):
    """Rescanned line-STED scan throughput (default engine routing: rfft
    phase accumulation for collapsed, fused Pallas megakernel per-step)."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    grid = Grid(SCAN_SIZE, SCAN_SIZE)
    geom = RescanGeometry(grid, rescan_factor=2.0, chunk=32)
    sample = samples.siemens_star((SCAN_SIZE, SCAN_SIZE))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    fn = jax.jit(lambda s, p, k: jnp.sum(rescanned_line_sted_image(
        s, p, geom, key=k, method="scan", noise_mode=noise_mode).image))
    jax.block_until_ready(fn(sample, params, jax.random.key(RUN_SEED + 500)))
    float(fn(sample, params, jax.random.key(RUN_SEED + 599)))
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(sample, params, jax.random.key(RUN_SEED + 501 + i)))
    percall = SCAN_SIZE * iters / (time.perf_counter() - t0)
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan",
            noise_mode=noise_mode).image,
        sample, params, geom.canvas_shape,
        seed_off=600 + hash(noise_mode) % 100, batch=BATCH_512)
    return percall, SCAN_SIZE / dev_dt


def bench_fractional_rescan_per_step():
    """Camera-faithful per-step noise at a FRACTIONAL rescan factor: the
    transposed tiered-sampling + MXU-DFT hybrid (docs/PERFORMANCE.md),
    the only engine family that samples every frame at non-integer R."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    geom = RescanGeometry(Grid(SCAN_SIZE, SCAN_SIZE), rescan_factor=1.5,
                          chunk=32)
    sample = samples.siemens_star((SCAN_SIZE, SCAN_SIZE))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan",
            noise_mode="per_step").image,
        sample, params, geom.canvas_shape, seed_off=900, batch=BATCH_512)
    return SCAN_SIZE / dev_dt


def bench_practical_rescan_collapsed():
    """Collapsed rescan scan at the PRACTICAL recommended operating point:
    ``practical_rescan_factor`` default-snaps R-1 to a p/q multiple of 1/8
    (an equally-valid point on the flat variance curve), which routes the
    collapsed engine onto the rational-step strip placement path (no
    per-frame DFT; docs/PERFORMANCE.md)."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
    from rescan_line_sted_tpu.imaging.rescan import practical_rescan_factor

    size = SCAN_SIZE
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    r_prac = float(practical_rescan_factor(params, size))
    geom = RescanGeometry(Grid(size, size), rescan_factor=r_prac, chunk=32)
    sample = samples.siemens_star((size, size))
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan").image,
        sample, params, geom.canvas_shape, seed_off=850, batch=BATCH_512)
    return size / dev_dt, r_prac


def bench_fractional_rescan_analytic():
    """Closed-form rescanned acquisition at the theory-optimal FRACTIONAL
    rescan factor (subpixel placement, r2 capability): equivalent scan
    steps/sec of the whole-canvas analytic engine."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image
    from rescan_line_sted_tpu.imaging.rescan import optimal_rescan_factor

    size = SCAN_SIZE
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    r_opt = round(float(optimal_rescan_factor(params, size)), 3)
    geom = RescanGeometry(Grid(size, size), rescan_factor=r_opt, chunk=32)
    sample = samples.siemens_star((size, size))
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="analytic").image,
        sample, params, geom.canvas_shape, seed_off=800)
    return size / dev_dt, r_opt


def bench_large_fov_steps_per_sec(size: int = 2048):
    """Single-chip large-FOV line-STED scan (SURVEY section 6 long-context
    row; the multi-chip spatially-sharded version runs in dryrun_multichip)."""
    grid = Grid(size, size)
    geom = LineSTEDGeometry(grid, chunk=64)
    sample = samples.siemens_star((size, size))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    dev_dt = _amortized_image_s(
        lambda s, p, k: line_sted_image(s, p, geom, key=k,
                                        method="scan").image,
        sample, params, (size, size), n=5, seed_off=700)
    return size / dev_dt


def bench_large_fov_per_step(size: int = 2048):
    """Camera-faithful per-step noise at large width: the banded windowed
    hybrid at fractional R (VERDICT r2 item 6 -- measured against the FFT
    path at 512/1024 the hybrid wins 7-26x and the gap widens with W, so
    there is no crossover to route around; this entry tracks the large-W
    rate round-over-round)."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    geom = RescanGeometry(Grid(size, size), rescan_factor=1.5, chunk=32)
    sample = samples.siemens_star((size, size))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan",
            noise_mode="per_step").image,
        sample, params, geom.canvas_shape, n=3, seed_off=970)
    return size / dev_dt


def bench_large_fov_per_step_irrational(size: int = 2048):
    """Camera-faithful per-step noise at a truly-IRRATIONAL rescan factor
    (r4 VERDICT weak #3): no rational class structure, so placement runs
    the banded kernel's r5 NUFFT spreading mode (two parity canvases of a
    2x-oversampled fine grid + one window deconvolution per image)
    instead of the rDFT hybrid's per-frame K-column DFT matmuls (~6.5k
    steps/s at this size, docs/PERFORMANCE.md banded A/B table)."""
    from rescan_line_sted_tpu.config import RescanGeometry
    from rescan_line_sted_tpu.imaging import rescanned_line_sted_image

    geom = RescanGeometry(Grid(size, size),
                          rescan_factor=1.0 + float(np.pi) / 16, chunk=32)
    sample = samples.siemens_star((size, size))
    params = LineSTEDParams.create(depletion=8.0, **LINE_KW)
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_line_sted_image(
            s, p, geom, key=k, method="scan",
            noise_mode="per_step").image,
        sample, params, geom.canvas_shape, n=3, seed_off=975)
    return size / dev_dt


def bench_point_per_step(size: int = None):
    """Camera-faithful per-step point-STED scan (banded-window engine, r3):
    every 2D camera frame Poisson-sampled; size^2 scan positions per image,
    windowed to the pinhole support (the reference's per-pixel point loop,
    SURVEY.md call stack 4.1)."""
    from rescan_line_sted_tpu.imaging import point_sted_image

    size = size or SCAN_SIZE
    geom = PointSTEDGeometry(Grid(size, size), chunk=64)
    sample = samples.siemens_star((size, size))
    params = PointSTEDParams.create(depletion=8.0, **POINT_KW)
    dev_dt = _amortized_image_s(
        lambda s, p, k: point_sted_image(s, p, geom, key=k, method="scan",
                                         noise_mode="per_step").image,
        sample, params, (size, size), n=5, seed_off=980)
    return size * size / dev_dt


def bench_ism_analytic():
    """Rescanned point-STED (2D pixel reassignment / ISM, beyond-reference):
    closed-form acquisition incl. the Poisson draw, as equivalent point-scan
    steps/s (one acquisition = size^2 scan positions)."""
    from rescan_line_sted_tpu.config import RescanPointGeometry
    from rescan_line_sted_tpu.imaging import rescanned_point_sted_image

    size = 256
    geom = RescanPointGeometry(Grid(size, size), rescan_factor=2.0)
    sample = samples.siemens_star((size, size))
    params = PointSTEDParams.create(depletion=8.0, **POINT_KW)
    dev_dt = _amortized_image_s(
        lambda s, p, k: rescanned_point_sted_image(s, p, geom,
                                                   key=k).image,
        sample, params, geom.canvas_shape, seed_off=950)
    return size * size / dev_dt


def bench_tpu_sweep():
    grid = Grid(SWEEP_SIZE, SWEEP_SIZE)
    pgeom, lgeom = PointSTEDGeometry(grid), LineSTEDGeometry(grid)
    sample = samples.siemens_star((SWEEP_SIZE, SWEEP_SIZE))
    pbase = PointSTEDParams.create(**POINT_KW)
    lbase = LineSTEDParams.create(**LINE_KW)
    powers = jnp.linspace(0.0, 16.0, SWEEP_POWERS)

    # every concrete pytree rides as a jit argument (closure constants
    # trigger the eager tunnel-compile storm; see _amortized_image_s)
    def _checksum_all(s, pb, lb, p, k):
        out = dose_matched_sweep(s, pb, lb, pgeom, lgeom, p, 100.0, key=k)
        # checksum EVERY leaf: a partial checksum would let XLA dead-code-
        # eliminate the unreferenced sweep arms from the timed program
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree.leaves(out))

    fn = jax.jit(_checksum_all)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(sample, pbase, lbase, powers,
                             jax.random.key(RUN_SEED + 100)))
    compile_s = time.perf_counter() - t0

    # headline wall-clock measured AMORTIZED (n sweeps folded into one
    # program, perturbed sample per iteration -- same honest harness as
    # every device rate): the oracle denominator is pure compute, so the
    # TPU numerator must not be dominated by the tunnel's ~28 ms per-call
    # dispatch artifact (real-hardware dispatch is ~100 us).
    n = 5

    def many(s, pb, lb, p, keys):
        def body(acc, k):
            s_k = s * (1.0 + 1e-6 * jax.random.uniform(k))
            return acc + _checksum_all(s_k, pb, lb, p, k), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), keys)
        return out

    f = jax.jit(many)
    float(f(sample, pbase, lbase, powers,
            jax.random.split(jax.random.key(RUN_SEED + 199), n)))
    best = 1e30
    for r in range(2):
        keys = jax.random.split(jax.random.key(RUN_SEED + 101 + r), n)
        t0 = time.perf_counter()
        float(f(sample, pbase, lbase, powers, keys))
        best = min(best, (time.perf_counter() - t0) / n)
    return best, compile_s


def bench_oracle_sweep():
    """Per-sweep-point oracle cost, from timed per-step costs (see module
    doc). Each subset is timed twice and the MINIMUM per-step cost kept:
    the oracle shares the host CPU with the tunnel client, and transient
    contention otherwise swings the headline denominator run-to-run."""
    n = SWEEP_SIZE
    sample = np.asarray(samples.siemens_star((n, n)), np.float64)
    rng = np.random.default_rng(0)

    # --- point-STED: time a subset of scan positions ---
    shape = sample.shape
    exc = oracle.gaussian_psf(shape, POINT_KW["sigma_exc"])
    dep = oracle.donut_psf(shape, POINT_KW["sigma_dep"])
    eff = oracle.effective_psf(exc, dep, 8.0)
    det = oracle.detection_psf(shape, POINT_KW["sigma_det"])
    pin = oracle.pinhole_mask(shape, POINT_KW["pinhole_radius"])
    point_per_step = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for step in range(ORACLE_POINT_STEPS):
            y0, x0 = step // n, step % n
            ill = oracle.shift_to(eff, y0, x0)
            cam = oracle.fft_convolve(sample * ill, det)
            cam = rng.poisson(np.maximum(cam, 0.0)).astype(np.float64)
            _ = np.sum(cam * oracle.shift_to(pin, y0, x0))
        point_per_step = min(point_per_step, (time.perf_counter() - t0)
                             / ORACLE_POINT_STEPS)

    # --- line-STED: time a subset of column positions ---
    excl = oracle.line_excitation_profile(n, LINE_KW["sigma_exc"])
    depl = oracle.stripe_depletion_profile(n, LINE_KW["stripe_period"])
    effl = oracle.effective_psf(excl, depl, 8.0)
    slit = oracle.slit_profile(n, LINE_KW["slit_halfwidth"])
    line_per_step = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for x0 in range(ORACLE_LINE_STEPS):
            ill = oracle.shift_profile_to(effl, x0)[None, :]
            cam = oracle.fft_convolve(sample * ill, det)
            cam = rng.poisson(np.maximum(cam, 0.0)).astype(np.float64)
            _ = cam @ oracle.shift_profile_to(slit, x0)
        line_per_step = min(line_per_step, (time.perf_counter() - t0)
                            / ORACLE_LINE_STEPS)

    per_point = n * n * point_per_step + n * line_per_step
    return per_point * SWEEP_POWERS, point_per_step, line_per_step


def bench_oracle_anchor(n: int = 64, powers: int = 2):
    """Validate the linear per-step extrapolation with ONE full run.

    Runs the oracle's complete point+line acquisition ``powers`` times at a
    small size (nothing extrapolated), and separately predicts that cost
    from per-step subset timings exactly like ``bench_oracle_sweep`` does.
    The measured/extrapolated ratio anchors the headline denominator.
    """
    sample = np.asarray(samples.siemens_star((n, n)), np.float64)
    rng = np.random.default_rng(0)

    # --- extrapolated prediction from subsets (same method as the sweep) ---
    shape = sample.shape
    exc = oracle.gaussian_psf(shape, POINT_KW["sigma_exc"])
    dep = oracle.donut_psf(shape, POINT_KW["sigma_dep"])
    eff = oracle.effective_psf(exc, dep, 8.0)
    det = oracle.detection_psf(shape, POINT_KW["sigma_det"])
    pin = oracle.pinhole_mask(shape, POINT_KW["pinhole_radius"])
    subset = 256
    t0 = time.perf_counter()
    for step in range(subset):
        y0, x0 = step // n, step % n
        ill = oracle.shift_to(eff, y0, x0)
        cam = oracle.fft_convolve(sample * ill, det)
        cam = rng.poisson(np.maximum(cam, 0.0)).astype(np.float64)
        _ = np.sum(cam * oracle.shift_to(pin, y0, x0))
    pt = (time.perf_counter() - t0) / subset
    excl = oracle.line_excitation_profile(n, LINE_KW["sigma_exc"])
    depl = oracle.stripe_depletion_profile(n, LINE_KW["stripe_period"])
    effl = oracle.effective_psf(excl, depl, 8.0)
    slit = oracle.slit_profile(n, LINE_KW["slit_halfwidth"])
    t0 = time.perf_counter()
    for x0 in range(16):
        ill = oracle.shift_profile_to(effl, x0)[None, :]
        cam = oracle.fft_convolve(sample * ill, det)
        cam = rng.poisson(np.maximum(cam, 0.0)).astype(np.float64)
        _ = cam @ oracle.shift_profile_to(slit, x0)
    ln = (time.perf_counter() - t0) / 16
    extrapolated = powers * (n * n * pt + n * ln)

    # --- full, non-extrapolated run ---
    t0 = time.perf_counter()
    for p in range(powers):
        oracle.point_sted_image(sample, depletion=8.0 * p, rng=rng,
                                **POINT_KW)
        oracle.line_sted_image(sample, depletion=8.0 * p, rng=rng, **LINE_KW)
    measured = time.perf_counter() - t0
    return measured, extrapolated


def bench_oracle_line_step_at(n: int, steps: int = 16) -> float:
    """Oracle per-line-step cost at size n (for the loop-vs-loop figure)."""
    sample = np.asarray(samples.siemens_star((n, n)), np.float64)
    rng = np.random.default_rng(0)
    det = oracle.detection_psf(sample.shape, LINE_KW["sigma_det"])
    excl = oracle.line_excitation_profile(n, LINE_KW["sigma_exc"])
    depl = oracle.stripe_depletion_profile(n, LINE_KW["stripe_period"])
    effl = oracle.effective_psf(excl, depl, 8.0)
    slit = oracle.slit_profile(n, LINE_KW["slit_halfwidth"])
    t0 = time.perf_counter()
    for x0 in range(steps):
        ill = oracle.shift_profile_to(effl, x0)[None, :]
        cam = oracle.fft_convolve(sample * ill, det)
        cam = rng.poisson(np.maximum(cam, 0.0)).astype(np.float64)
        _ = cam @ oracle.shift_profile_to(slit, x0)
    return (time.perf_counter() - t0) / steps


def _probe_devices(timeout_s: int = 240) -> "tuple[bool, str]":
    """Device-init watchdog. During axon-worker recovery, ``jax.devices()``
    hangs indefinitely (no error, no timeout), which would hang the whole
    bench run; probing in a subprocess bounds it. 240 s is far above a
    healthy tunnel's init time. A healthy run pays one extra device init
    for this (tens of seconds through the tunnel) -- accepted: the parent
    cannot bound its OWN first ``jax.devices()`` call, so probing up front
    is the only way to avoid an unbounded hang on the common full-outage
    case. (A tunnel that drops in the window between a successful probe
    and the parent's init can still hang the parent; callers should run
    bench.py under their own overall timeout.)

    Returns ``(ok, diagnostic)`` -- the tail of the probe's stderr on
    failure, so a persistent non-outage failure (missing plugin, version
    skew) is not misreported as a tunnel outage."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True)
        if r.returncode == 0:
            return True, ""
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-8:]
        return False, "probe exited {}: {}".format(
            r.returncode, " | ".join(tail))
    except subprocess.TimeoutExpired:
        return False, f"probe hung >{timeout_s}s (no output)"


def _wait_for_devices() -> "tuple[bool, str]":
    """Retry the device probe across an axon-worker outage window.

    Tunnel outages after a worker crash run 10 min to multiple hours; one
    failed probe should not forfeit the round's measurements. Probes every
    2 min until the budget (``RLS_BENCH_DEVICE_WAIT_S``, default 45 min,
    0 = single probe) runs out; progress goes to stderr so a caller
    tailing the log sees waiting, not a hang. Returns ``(ok, last
    diagnostic)``."""
    import sys

    raw = os.environ.get("RLS_BENCH_DEVICE_WAIT_S", "2700")
    try:
        budget_s = float(raw)
    except ValueError:
        print(f"bench: ignoring malformed RLS_BENCH_DEVICE_WAIT_S={raw!r}; "
              "using default 2700", file=sys.stderr, flush=True)
        budget_s = 2700.0
    deadline = time.monotonic() + budget_s
    attempt = 0
    diag = ""
    while True:
        attempt += 1
        ok, diag = _probe_devices()
        if ok:
            return True, ""
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False, diag
        print(f"bench: device init probe {attempt} failed ({diag}); "
              f"retrying for {remaining / 60:.0f} more min",
              file=sys.stderr, flush=True)
        time.sleep(min(120.0, remaining))


def main():
    dev_ok, dev_diag = _wait_for_devices()
    if not dev_ok:
        print(json.dumps({
            "metric": "e2e_dose_sweep_speedup_vs_cpu_numpy",
            "value": 0,
            "unit": "x",
            "vs_baseline": 0,
            "details": {
                "hardware_unavailable": True,
                "error": "device init hung/failed through the full "
                         "RLS_BENCH_DEVICE_WAIT_S retry window (axon "
                         "tunnel outage / worker recovery); no measurement "
                         "taken -- see prior BENCH_r*.json for real "
                         "numbers",
                "last_probe_diagnostic": dev_diag,
            },
        }))
        raise SystemExit(1)
    assert jax.devices(), "no devices"
    backend = jax.default_backend()
    # Persistent compilation cache (measured 119.6 s -> 1.7 s for the
    # per-step scan program in a fresh process): compile_s below reflects a
    # warm cache once .jax_cache is populated by an earlier run.
    from rescan_line_sted_tpu.utils.observability import (
        enable_compilation_cache,
    )

    cache_dir = enable_compilation_cache()

    steps_per_sec, steps_dev, scan_compile_s, scan_dt = \
        bench_scan_steps_per_sec("collapsed")
    steps_per_sec_ps, steps_dev_ps, _, _ = bench_scan_steps_per_sec(
        "per_step")
    rescan_sps, rescan_dev = bench_rescan_steps_per_sec()
    _, rescan_dev_ps = bench_rescan_steps_per_sec("per_step")
    frac_dev, r_opt = bench_fractional_rescan_analytic()
    prac_dev, r_prac = bench_practical_rescan_collapsed()
    frac_ps_dev = bench_fractional_rescan_per_step()
    ism_dev = bench_ism_analytic()
    point_ps_dev = bench_point_per_step()
    large_fov_dev = bench_large_fov_steps_per_sec(2048)
    large_ps_dev = bench_large_fov_per_step(2048)
    large_ps_irr_dev = bench_large_fov_per_step_irrational(2048)
    tpu_sweep_s, sweep_compile_s = bench_tpu_sweep()
    cold_lower_s, cold_compile_s = bench_cold_compile()
    oracle_sweep_s, pt_step, ln_step = bench_oracle_sweep()
    anchor_measured, anchor_extrap = bench_oracle_anchor()
    oracle_ln_512 = bench_oracle_line_step_at(SCAN_SIZE)
    # APPLY the anchor (VERDICT r2 item 5): the extrapolated denominator is
    # multiplied by the measured/extrapolated ratio of the one full oracle
    # run, so the headline speedup self-corrects whichever direction the
    # linear extrapolation drifts.
    anchor_ratio = anchor_measured / anchor_extrap
    oracle_sweep_corrected = oracle_sweep_s * anchor_ratio
    speedup = oracle_sweep_corrected / tpu_sweep_s
    loop_vs_loop = steps_dev * oracle_ln_512

    print(json.dumps({
        "metric": "e2e_dose_sweep_speedup_vs_cpu_numpy",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "details": {
            "backend": backend,
            "device": str(jax.devices()[0]),
            "tpu_sweep_wall_s": round(tpu_sweep_s, 4),
            "oracle_sweep_wall_s_extrapolated": round(oracle_sweep_s, 2),
            "oracle_sweep_wall_s_anchor_corrected": round(
                oracle_sweep_corrected, 2),
            "oracle_anchor_measured_over_extrapolated": round(
                anchor_ratio, 3),
            "oracle_anchor_correction_applied": True,
            "oracle_threads": os.environ.get("OMP_NUM_THREADS"),
            "oracle_anchor_config": "full 64^2 x 2-power oracle sweep, "
                                    "nothing extrapolated",
            "oracle_point_step_s": round(pt_step, 6),
            "oracle_line_step_s": round(ln_step, 6),
            "scan_path_loop_vs_loop_x": round(loop_vs_loop, 1),
            "sweep_config": f"{SWEEP_POWERS} powers, {SWEEP_SIZE}^2, "
                            "point+line, Poisson noise",
            "line_sted_scan_steps_per_sec_chip": round(steps_per_sec, 1),
            "line_sted_scan_steps_per_sec_device": round(steps_dev, 1),
            "line_sted_scan_steps_per_sec_chip_per_step_noise":
                round(steps_per_sec_ps, 1),
            "line_sted_scan_steps_per_sec_device_per_step_noise":
                round(steps_dev_ps, 1),
            "rescan_scan_steps_per_sec_chip": round(rescan_sps, 1),
            "rescan_scan_steps_per_sec_device": round(rescan_dev, 1),
            "rescan_scan_steps_per_sec_device_per_step_noise":
                round(rescan_dev_ps, 1),
            "rescan_analytic_fractional_R_steps_per_sec_device":
                round(frac_dev, 1),
            "rescan_per_step_fractional_R_steps_per_sec_device":
                round(frac_ps_dev, 1),
            "ism_rescan_point_equiv_steps_per_sec_device":
                round(ism_dev, 1),
            "point_sted_per_step_steps_per_sec_device":
                round(point_ps_dev, 1),
            "rescan_optimal_fractional_R": r_opt,
            "rescan_practical_R_snapped": r_prac,
            "rescan_collapsed_practical_R_steps_per_sec_device":
                round(prac_dev, 1),
            "large_fov_2048_steps_per_sec_device": round(large_fov_dev, 1),
            "rescan_per_step_2048_fractional_R_steps_per_sec_device":
                round(large_ps_dev, 1),
            "rescan_per_step_2048_irrational_R_steps_per_sec_device":
                round(large_ps_irr_dev, 1),
            "line_sted_scan_size": SCAN_SIZE,
            "scan_wall_s_per_image": round(scan_dt, 4),
            "compile_s": {"scan": round(scan_compile_s, 1),
                          "sweep": round(sweep_compile_s, 1),
                          "persistent_cache": bool(cache_dir),
                          # cache-bypassed fresh-jit trace + XLA compile
                          # of the collapsed scan program (r3 VERDICT
                          # item 4: tracked cold-compile health)
                          "cold_lower_s": round(cold_lower_s, 1),
                          "cold_compile_s": round(cold_compile_s, 1)},
            # every *_chip field times one FORCED dispatch per call through
            # the axon tunnel (~26 ms RTT): it measures dispatch, not
            # compute. Round-over-round changes there are NOT perf
            # regressions; compare *_device fields (docs/PERFORMANCE.md
            # "Per-call vs amortized" -- r3 VERDICT item 5).
            "per_call_chip_fields_dispatch_dominated": True,
            # fraction of the DOCUMENTED composite bound each rooflined
            # entry attains (r3 VERDICT item 4: driver-visible
            # round-over-round bound tracking). Bounds live in
            # docs/PERFORMANCE.md and change only when a roofline is
            # re-measured. 512^2-class entries fold BATCH_512 images into
            # each timing iteration, so the per-image harness floor is
            # HARNESS_FLOOR_S / BATCH_512 and the rates are resolvable
            # compute measurements (r4 VERDICT weak #4); anything still
            # at/under 2x that residual floor is annotated, not claimed.
            "bound_fractions": {
                "rescan_per_step_2048_fractional_R": {
                    "bound_steps_per_sec": BOUND_2048_PER_STEP,
                    "fraction": round(large_ps_dev / BOUND_2048_PER_STEP,
                                      3),
                    "derivation": "PERFORMANCE.md r5 grounded bound: "
                                  "conv 68.7 GMAC / 15.6 TMAC/s measured "
                                  "primitive + sampler (537 Mpx uniform+"
                                  "exp + 1993 M CDF-inversion terms) + "
                                  "8192 roll+add windows = 11.98 ms/img; "
                                  "every count algebraic (perf_tier_mix)"
                                  ", every rate a standalone-kernel "
                                  "primitive (perf_vpu_bound)",
                },
                "harness_floor_dominated": [
                    k for k, v in {
                        "line_sted_scan_steps_per_sec_device": steps_dev,
                        "line_sted_scan_steps_per_sec_device_per_step_noise":
                            steps_dev_ps,
                        "rescan_scan_steps_per_sec_device": rescan_dev,
                        "rescan_scan_steps_per_sec_device_per_step_noise":
                            rescan_dev_ps,
                        "rescan_per_step_fractional_R_steps_per_sec_device":
                            frac_ps_dev,
                        "rescan_collapsed_practical_R_steps_per_sec_device":
                            prac_dev,
                    }.items()
                    if SCAN_SIZE / v < 2 * HARNESS_FLOOR_S / BATCH_512
                ],
                "harness_floor_s": HARNESS_FLOOR_S,
                "batched_images_per_dispatch_512": BATCH_512,
            },
            "north_star_target_x": 100.0,
        },
    }))
    # Compact summary printed LAST (r4 VERDICT weak #2): the driver's tail
    # capture front-truncates long output, so the huge details line above
    # can lose its leading headline fields. This final line is small
    # enough to always survive whole -- machine-readable headline + the
    # flagship device rates, parseable standalone.
    print(json.dumps({
        "metric": "e2e_dose_sweep_speedup_vs_cpu_numpy",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
        "scan_path_loop_vs_loop_x": round(loop_vs_loop, 1),
        "line_sted_scan_steps_per_sec_device": round(steps_dev, 1),
        "line_sted_scan_steps_per_sec_device_per_step_noise":
            round(steps_dev_ps, 1),
        "rescan_scan_steps_per_sec_device": round(rescan_dev, 1),
        "rescan_scan_steps_per_sec_device_per_step_noise":
            round(rescan_dev_ps, 1),
        "rescan_per_step_fractional_R_steps_per_sec_device":
            round(frac_ps_dev, 1),
        "large_fov_2048_steps_per_sec_device": round(large_fov_dev, 1),
        "rescan_per_step_2048_fractional_R_steps_per_sec_device":
            round(large_ps_dev, 1),
        "rescan_per_step_2048_irrational_R_steps_per_sec_device":
            round(large_ps_irr_dev, 1),
        "summary_of_details_line_above": True,
    }))


if __name__ == "__main__":
    main()
