"""Banded fused rescan scan-loop megakernel.

One ``pallas_call`` executes the whole rescanned line-STED scan on the
*banded windows* of ``imaging/rescan._illum_band`` (reference call stack
4.3's per-position camera loop, SURVEY.md section 4.3): per chunk of scan
positions it

1. dynamic-slices the chunk's ``D_in``-column sample window from the
   VMEM-resident (extended) sample,
2. x-convolves with the CHUNK-INVARIANT binned conv table
   ``[C, D_out/b, D_in]`` (illumination-scaled detection circulant window,
   row binning folded in) as one MXU matmul,
3. draws per-camera-frame shot noise in-register from the hardware PRNG
   (tier-dispatched, ``store_poisson_tiered``), and
4. scatter-accumulates every frame window into the canvas at its integer
   per-position offset (8-aligned base + residual roll).

This is the conv+sample+place fusion the windowed ``lax.scan`` hybrid
(``rescan._scan_fallback``) cannot express: that engine streams each
chunk's ``[C, D_out, H]`` window through HBM between the conv matmul, the
Pallas sampler, and the MXU-rDFT placement matmuls. Here the canvas, the
conv table, and the sample stay resident in VMEM for the whole grid and
the rDFT placement stage disappears entirely -- integer scatter is exact
(no bf16 placement rounding).

Placement covers every *integer* per-position offset pattern, which via
the rational-strip decomposition (see ``rescan._scan``) includes any
rational offset step ``p/q``: position ``pos`` places at integer offset
``int_offsets[pos]`` inside class canvas ``classes[pos]``, and the caller
applies each class's fractional residue as one spectral shift afterwards.
Rounded reassignment is the ``q = 1`` special case. Truly-irrational
(or large-q rational) steps run the NUFFT SPREADING mode (r4 VERDICT
weak #3): each frame is convolved in-kernel with its position's window
taps (exponential-of-semicircle, ``rescan._nufft_spread_tables``) split
by parity of a 2x-oversampled fine grid, integer-placed on two parity
canvases, and the caller merges parities + deconvolves the window
spectrum once per image -- type-1 NUFFT semantics, subpixel-exact to
~1e-6 at P = 8 taps, at near-integer-placement cost instead of the rDFT
hybrid's per-frame K-column DFT matmuls.

Frame windows are UNWRAPPED camera coordinates: a window crossing the
camera's periodic boundary splits at the one possible ``W/b`` multiple
into two placements ``W/b`` apart (same argument as the strip engine);
the split row and both canvas starts are precomputed per chunk/position
as prefetch scalars, and the second placement is predicated off for the
(majority of) chunks that do not cross.

Sampler loops run as ``lax.fori_loop`` over 8-aligned ref slices rather
than Python-unrolled sub-chunk calls, which keeps the Mosaic program size
(and compile time) independent of the chunk width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rescan_line_sted_tpu.config import matmul_precision

_PRECISION = matmul_precision(pallas=True)
_SUB_ROWS = 32  # minimum sampler tier-dispatch granularity (rows)


def _sub_rows(cam_rows: int) -> int:
    """Sampler tier-dispatch granularity (rows of the [C*dob, lane] camera
    scratch per tier decision).

    The per-sub-block machinery (slice + max + seed + branch) is pure
    iteration count -- at 2048^2 it cost 18.9 ms/img at 32-row granularity
    vs ~4.7 at 128 (docs/PERFORMANCE.md r4 roofline) -- while coarser tier
    decisions barely increase tier work (the band window is illuminated
    almost everywhere, so sub-blocks rarely differ in tier). 128 rows wins
    at every measured width (512^2 and 2048^2) and is the default wherever
    it divides the camera block. RLS_BANDED_SUB_ROWS overrides for
    experiments; must be a multiple of 8 and divide ``cam_rows``.
    """
    import os

    forced = os.environ.get("RLS_BANDED_SUB_ROWS")
    if forced:
        return int(forced)
    return 128 if cam_rows % 128 == 0 else _SUB_ROWS


def pick_lane(hb: int) -> int:
    """Canvas lane-tile width (the H/b axis tile of one grid step).

    Wider tiles amortize per-invocation overhead (grid steps = hb/lane *
    n_chunks) and per-sub-block sampler machinery (both measured dominant
    at 2048^2 -- docs/PERFORMANCE.md r4 roofline): the default prefers the
    widest of {512, 256, 128} dividing hb. VMEM stays well under the gate
    at every shipped config (the routing gate recomputes the footprint
    with this same helper). RLS_BANDED_LANE overrides for experiments.
    """
    import os

    forced = os.environ.get("RLS_BANDED_LANE")
    if forced:
        return int(forced)
    for lane in (512, 256, 128):
        if hb % lane == 0 and hb > lane:
            return lane
    return hb


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def seeds_consumed(*, w: int, chunk: int, dob: int, hb: int) -> int:
    """Number of PRNG seeds one noisy kernel run consumes: one per
    (chunk, lane-tile, sampler sub-block). Callers running several kernel
    instances from one key (e.g. per-device shards in
    ``parallel.sharded_rescan``) stride their seed streams by this so
    streams never collide, whatever lane/sub-row policy is active."""
    return (w // chunk) * (hb // pick_lane(hb)) * (chunk * dob) \
        // _sub_rows(chunk * dob)


def banded_fused_vmem_bytes(*, w: int, d_in: int, d_out: int, chunk: int,
                            binning: int, q: int, wc: int, hb: int,
                            n_spread: int = 0) -> int:
    """VMEM footprint (bytes) of one ``rescan_banded_fused`` grid step.

    Mirrors the kernel's BlockSpec/scratch list one-for-one (conv table,
    sample_ext tile, optional binning-column block, canvas block, camera
    scratch, pad scratch) so the routing gate in ``imaging/rescan._scan``
    can never drift from the kernel's actual residency -- in particular
    the ``b > 1`` binning-column block, which a hand-copied estimate once
    omitted (round-3 advisor finding).
    """
    b = binning
    dob = d_out // b
    lane_out = pick_lane(hb)
    lane_in = lane_out * b
    w_pad = (_round_up(dob + n_spread - 1, 8) if n_spread
             else _round_up(dob, 8)) + 8
    wcp = _round_up(wc + w_pad, 8)
    n = (chunk * dob * d_in          # conv table block [C, dob, Di]
         + (w + d_in) * lane_in      # sample_ext tile
         + q * wcp * lane_out        # canvas block [q*wcp, lane]
         + chunk * dob * lane_out    # camera scratch
         + w_pad * lane_out)         # pad scratch
    if n_spread:
        n += w * 2 * n_spread        # NUFFT tap-weight table [W, 2*P/2]
    if b != 1:
        n += lane_in * lane_out      # binning-column block [Li, Lo]
    return 4 * n


def _kernel(sa_lo_ref, sa_hi_ref, m0_ref, seed_ref,
            swb_ref, sample_ext_ref, *rest,
            chunk: int, d_in: int, dob: int, w_pad: int, noisy: bool,
            n_tiles: int, binning: int, sub_rows: int = _SUB_ROWS,
            stage: str = "full", n_spread: int = 0, n_pos: int = 0):
    if n_spread:
        wt_ref, *rest = rest
    if binning != 1:
        bcol_ref, out_ref, cam_scratch, pad_scratch = rest
    else:
        out_ref, cam_scratch, pad_scratch = rest
    t = pl.program_id(0)
    ic = pl.program_id(1)

    @pl.when(ic == 0)
    def _init_canvas():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when((t == 0) & (ic == 0))
    def _init_pad():
        # rows [dob, w_pad) are the roll headroom; written once, never again
        pad_scratch[:] = jnp.zeros_like(pad_scratch)

    # chunk's sample window: rows [p0, p0 + d_in) of the extended sample
    # (sample_ext[r] = sample^T[(r - s_in) % w], so the circular wrap is
    # pre-unrolled; chunk % 8 == 0 keeps the dynamic sublane start aligned)
    p0 = pl.multiple_of(ic * chunk, 8)
    win = sample_ext_ref[pl.ds(p0, d_in), :]                 # [Di, Li]
    cam = jnp.dot(swb_ref[...].reshape(chunk * dob, d_in), win,
                  preferred_element_type=jnp.float32,
                  precision=_PRECISION)                      # [C*dob, Li]
    if binning != 1:
        cam = jnp.dot(cam, bcol_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=_PRECISION)                  # [C*dob, Lo]
    if noisy and stage in ("full", "sample"):
        from rescan_line_sted_tpu.kernels.poisson_pallas import (
            store_poisson_tiered,
        )

        # clamp band-limited negative excursions (same contract as
        # poisson_rows_tiered's wrapper) before drawing counts
        cam_scratch[:] = jnp.maximum(cam, 0.0)
        n_sub = (chunk * dob) // sub_rows
        base_seed = (ic * n_tiles + t) * n_sub

        def _sample(k2, carry):
            rows = pl.ds(pl.multiple_of(k2 * sub_rows, 8), sub_rows)
            store_poisson_tiered(cam_scratch, rows, cam_scratch[rows, :],
                                 (seed_ref[0], seed_ref[1] + base_seed + k2))
            return carry

        jax.lax.fori_loop(0, n_sub, _sample, 0)
    elif noisy and stage == "loop":
        # diagnostic: the sampler loop's slice + max + seed + branch
        # machinery with every tier predicated OFF (mx compared against an
        # unreachable sentinel) -- isolates loop overhead from tier work
        cam_scratch[:] = jnp.maximum(cam, 0.0)
        n_sub = (chunk * dob) // sub_rows
        base_seed = (ic * n_tiles + t) * n_sub

        def _loop_only(k2, carry):
            rows = pl.ds(pl.multiple_of(k2 * sub_rows, 8), sub_rows)
            mx = jnp.max(cam_scratch[rows, :])
            pltpu.prng_seed(seed_ref[0], seed_ref[1] + base_seed + k2)

            @pl.when(mx <= -1.0)
            def _never():
                cam_scratch[rows, :] = jnp.zeros(
                    (sub_rows, cam_scratch.shape[-1]), jnp.float32)

            return carry

        jax.lax.fori_loop(0, n_sub, _loop_only, 0)
    else:
        cam_scratch[:] = cam

    if stage in ("conv", "sample", "loop"):
        # diagnostic stages skip per-frame placement; one fixed canvas add
        # keeps the pipeline live (not DCE'd) without the placement loop
        out_ref[pl.ds(0, w_pad), :] += cam_scratch[0:w_pad, :]
        return

    # place each frame window: rows below m0 are this camera period, rows
    # at/after m0 wrapped into the next period (placed W/b earlier)
    m0 = m0_ref[ic]
    hi_mask = jax.lax.broadcasted_iota(
        jnp.int32, (dob, cam_scratch.shape[-1]), 0) >= m0

    if n_spread:
        # NUFFT spreading placement (irrational / any-step subpixel): each
        # frame is convolved with its position's n_spread window taps PER
        # PARITY of the 2x-oversampled fine grid (the wrapper's module
        # doc), then integer-placed on that parity's canvas -- per-frame
        # cost is n_spread shifted FMAs of the [dob, lane] frame plus the
        # same roll-adds as integer placement.
        lane = cam_scratch.shape[-1]
        d_store = _round_up(dob + n_spread - 1, 8)

        def _place(c, carry):
            pos = ic * chunk + c
            fr = cam_scratch[pl.ds(pl.multiple_of(c * dob, 8), dob), :]
            zero = jnp.zeros_like(fr)
            wt = wt_ref[pl.ds(pos, 1), :]            # [1, 2 * n_spread]

            def _spread(x, pi):
                acc = None
                for u in range(n_spread):
                    # Mosaic rejects zero-sized vectors: only pad with
                    # segments whose static row count is > 0 (u = 0 and,
                    # when d_store == dob + n_spread - 1, the last tail)
                    parts = [x]
                    if u:
                        parts.insert(0, jnp.zeros((u, lane), jnp.float32))
                    if d_store - dob - u:
                        parts.append(jnp.zeros((d_store - dob - u, lane),
                                               jnp.float32))
                    sh = parts[0] if len(parts) == 1 \
                        else jnp.concatenate(parts, axis=0)
                    term = wt[0, pi * n_spread + u] * sh
                    acc = term if acc is None else acc + term
                return acc

            def _add_at(off, frame):
                base = pl.multiple_of((off // 8) * 8, 8)
                pad_scratch[0:d_store, :] = frame
                out_ref[pl.ds(base, w_pad), :] += pltpu.roll(
                    pad_scratch[...], off % 8, 0)

            lo = jnp.where(hi_mask, zero, fr)
            hi = jnp.where(hi_mask, fr, zero)
            for pi in (0, 1):
                _add_at(sa_lo_ref[pi * n_pos + pos], _spread(lo, pi))

                @pl.when(m0 < dob)
                def _hi(pi=pi):
                    _add_at(sa_hi_ref[pi * n_pos + pos], _spread(hi, pi))

            return carry
    else:
        def _place(c, carry):
            pos = ic * chunk + c
            fr = cam_scratch[pl.ds(pl.multiple_of(c * dob, 8), dob), :]
            zero = jnp.zeros_like(fr)

            def _add_at(off, frame):
                base = pl.multiple_of((off // 8) * 8, 8)
                pad_scratch[0:dob, :] = frame
                out_ref[pl.ds(base, w_pad), :] += pltpu.roll(
                    pad_scratch[...], off % 8, 0)

            _add_at(sa_lo_ref[pos], jnp.where(hi_mask, zero, fr))

            @pl.when(m0 < dob)
            def _hi():
                _add_at(sa_hi_ref[pos], jnp.where(hi_mask, fr, zero))

            return carry

    jax.lax.fori_loop(0, chunk, _place, 0)


def rescan_banded_fused(
    sample_y: jnp.ndarray, eff_scaled: jnp.ndarray, gx: jnp.ndarray,
    int_offsets: jnp.ndarray, *, wc: int, d_in: int, d_out: int,
    chunk: int, binning: int = 1, classes: jnp.ndarray | None = None,
    q: int = 1, seed: jnp.ndarray | None = None,
    interpret: bool | None = None,
    spread_weights: jnp.ndarray | None = None,
    offsets2: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Banded fused rescan scan over all W column positions (module doc).

    sample_y: [H, W] y-convolved sample; eff_scaled: [W] centered
    brightness-scaled effective excitation profile; gx: [W] centered
    detection x-profile (the conv table windows its circulant directly --
    ``fftconv.circulant_window`` -- so the [W, W] matrix is never built);
    int_offsets: [W] int32 INTEGER canvas column offsets (binned pixels)
    per scan position; classes: [W] int32 class index in [0, q) (None =
    all zero); d_in/d_out: the static band windows of
    ``rescan._illum_band`` (d_out required); ``seed`` ([2] int32) draws
    per-camera-frame shot noise in-kernel from the hardware PRNG (TPU
    only; the interpreter's PRNG yields zeros), None = noise-free.

    NUFFT spreading placement (irrational / arbitrary-step subpixel
    reassignment, ``rescan._nufft_spread_tables``): pass
    ``spread_weights`` [W, 2 * P/2] (per-position window taps, split by
    PARITY of the 2x-oversampled fine grid) and ``offsets2`` [2, W] int32
    (per-parity integer coarse offsets). The kernel then accumulates TWO
    parity canvases (``q`` is forced to 2, ``classes``/``int_offsets``
    ignored); the caller merges parities and deconvolves the window
    spectrum once per image (``rescan._apply_nufft_deconv``).

    Returns folded class canvases ``[q, wc, H/b]`` in canvas-column-major
    layout (transpose for the image); the caller applies per-class
    fractional residues (or the NUFFT parity merge) and sums classes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = sample_y.shape
    b = binning
    hb, wb = h // b, w // b
    if d_out is None:
        raise ValueError("banded fused scan needs a frame window (d_out)")
    dob = d_out // b
    if w % chunk or chunk % 8:
        raise ValueError("chunk must divide W and be a multiple of 8")
    if not chunk <= d_in < w:
        raise ValueError("need chunk <= d_in < W (the slice-built extended "
                         "sample wraps the circular boundary at most once)")
    if chunk % b or d_out % b or ((d_out - chunk) // 2) % b:
        raise ValueError("binning must align the frame window")
    sub_rows = _sub_rows(chunk * dob)
    if (chunk * dob) % sub_rows:
        raise ValueError("chunk * d_out/b must be a multiple of 32")
    n_spread = 0
    if spread_weights is not None:
        if offsets2 is None or classes is not None or q != 1:
            raise ValueError("NUFFT spreading takes offsets2 and excludes "
                             "class placement")
        q = 2  # parity canvases of the 2x-oversampled fine grid
        n_spread = spread_weights.shape[-1] // 2
        w_pad = _round_up(dob + n_spread - 1, 8) + 8
    else:
        w_pad = _round_up(dob, 8) + 8
    if w_pad > wc:
        raise ValueError("frame window wider than canvas; use the "
                         "lax.scan engine")
    wcp = _round_up(wc + w_pad, 8)  # class stride (8-aligned)
    n_chunks = w // chunk
    s_in = (d_in - chunk) // 2
    s_out = (d_out - chunk) // 2

    # chunk-invariant binned conv table [C, dob, Di] (see
    # rescan._scan_fallback's banded tables; row binning is linear so it
    # folds into the table: binned window row r sums camera rows r*b..+b)
    from rescan_line_sted_tpu.kernels import fftconv

    ci = jnp.arange(chunk)[:, None]
    di = jnp.arange(d_in)[None, :]
    ill_w = eff_scaled[(w // 2 + di - s_in - ci) % w]        # [C, Di]
    g0w = fftconv.circulant_window(gx, d_out, d_in, s_out, s_in)  # [Do, Di]
    swb = (g0w[None] * ill_w[:, None, :]).reshape(
        chunk, dob, b, d_in).sum(2)                          # [C, dob, Di]

    # extended sample: sample_ext[r] = sample^T[(r - s_in) % w], so chunk
    # p0's window is rows [p0, p0 + d_in) -- no in-kernel wrap handling.
    # Built by slicing (the row sequence is a circular unroll), not by a
    # row gather: concat of contiguous slices is pure data movement.
    sample_t = sample_y.T                                    # [W, H]
    head = sample_t[w - s_in:] if s_in else sample_t[:0]
    tail = sample_t[:d_in - s_in]                  # d_in < w (guarded above)
    sample_ext = jnp.concatenate([head, sample_t, tail], axis=0)

    # placement scalars (module doc): per-chunk window base gstart and
    # wrap split row m0; per-position canvas starts with class folded in
    p0s = jnp.arange(n_chunks) * chunk
    gstart = (p0s - s_out) // b                              # [n_chunks]
    k0 = jnp.floor_divide(gstart, wb)
    m0 = (wb * (k0 + 1) - gstart).astype(jnp.int32)
    icp = jnp.arange(w) // chunk
    if n_spread:
        # per-parity canvas starts: parity pi of the fine grid places at
        # integer coarse offset offsets2[pi] on class canvas pi
        offs2 = jnp.asarray(offsets2, jnp.int32)             # [2, W]
        base = (gstart[icp][None] + offs2 - wb * k0[icp][None]) % wc
        stripe = jnp.arange(2, dtype=jnp.int32)[:, None] * wcp
        sa_lo = (stripe + base).reshape(-1).astype(jnp.int32)
        sa_hi = (stripe + (base - wb) % wc).reshape(-1).astype(jnp.int32)
    else:
        cls = jnp.zeros((w,), jnp.int32) if classes is None \
            else jnp.asarray(classes, jnp.int32)
        sa_lo = (gstart[icp] + jnp.asarray(int_offsets, jnp.int32)
                 - wb * k0[icp]) % wc
        sa_hi = (sa_lo - wb) % wc
        sa_lo = (cls * wcp + sa_lo).astype(jnp.int32)
        sa_hi = (cls * wcp + sa_hi).astype(jnp.int32)

    noisy = seed is not None
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    # Perf-diagnostic stage ladder (scripts/perf_roofline_2048.py): "conv"
    # skips sampler+placement, "loop" runs the sampler loop machinery with
    # tiers predicated off, "sample" skips placement, "place" skips the
    # sampler. Any value but "full" produces PHYSICALLY WRONG output --
    # never set outside roofline measurement.
    import os

    stage = os.environ.get("RLS_BANDED_STAGE", "full")
    if stage == "place":
        noisy = False
        stage = "full"

    lane_out = pick_lane(hb)
    n_tiles = hb // lane_out
    lane_in = lane_out * b

    in_specs = [
        pl.BlockSpec((chunk, dob, d_in),
                     lambda t, i, *s: (0, 0, 0),
                     memory_space=pltpu.VMEM),               # conv table
        pl.BlockSpec((w + d_in, lane_in),
                     lambda t, i, *s: (0, t),
                     memory_space=pltpu.VMEM),               # sample_ext tile
    ]
    args = [sa_lo, sa_hi, m0, jnp.asarray(seed, jnp.int32),
            swb, sample_ext]
    if n_spread:
        in_specs.append(
            pl.BlockSpec((w, 2 * n_spread), lambda t, i, *s: (0, 0),
                         memory_space=pltpu.VMEM))            # tap weights
        args.append(jnp.asarray(spread_weights, jnp.float32)
                    .reshape(w, 2 * n_spread))
    if b != 1:
        eyeh = jnp.eye(hb, dtype=jnp.float32)
        bcol = jnp.repeat(eyeh, b, axis=0)                   # [H, H/b]
        in_specs.append(
            pl.BlockSpec((lane_in, lane_out), lambda t, i, *s: (t, t),
                         memory_space=pltpu.VMEM))
        args.append(bcol)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles, n_chunks),                            # chunks fastest
        in_specs=in_specs,
        out_specs=pl.BlockSpec((q * wcp, lane_out),
                               lambda t, i, *s: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk * dob, lane_out), jnp.float32),
            pltpu.VMEM((w_pad, lane_out), jnp.float32),
        ],
    )
    padded = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, d_in=d_in, dob=dob,
                          w_pad=w_pad, noisy=noisy, n_tiles=n_tiles,
                          binning=b, sub_rows=sub_rows, stage=stage,
                          n_spread=n_spread, n_pos=w),
        out_shape=jax.ShapeDtypeStruct((q * wcp, hb), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    # fold each class's alignment tail back onto its canvas head
    per_cls = padded.reshape(q, wcp, hb)
    tail = wcp - wc
    return per_cls[:, :wc].at[:, :tail].add(per_cls[:, wc:])
