"""Algebraic sampler tier mix for the banded-fused per-step engine.

The r4 composite bound's dominant term ("irreducible sampler tier work
19.67 ms") was a MEASUREMENT of the engine's own sampler stage, so the
"93% of bound" roofline was partly circular (r4 VERDICT weak #5). This
script replaces that term with algebra: it rebuilds the noise-free
camera rates exactly as the kernel does (same ``circulant_window`` /
``effective_line_profile`` tables, same ``[chunk*dob, lane]`` blocking,
same ``sub_rows`` tier granularity -- mirrors
``kernels/rescan_banded_fused.py`` stages 1-2 and
``store_poisson_tiered``'s per-sub-block ``max`` dispatch), counts how
many sub-blocks land in each sampler tier, and converts the mix into
PRNG-word and Knuth/PTRS-round counts per image.

Combined with the hardware-primitive rates from
``scripts/perf_vpu_bound.py`` (a Knuth round / a PTRS attempt / raw
``prng_random_bits`` measured in MINIMAL standalone kernels, nothing
like the engine's loop), the sampler floor becomes

    T_sampler >= sum_tier  n_subblocks(tier) * rounds(tier) * t_round

i.e. an algebraic count times a primitive rate -- no self-reference.
Runs entirely on CPU (the camera rates are noise-free means).

Usage:  python scripts/perf_tier_mix.py [--size 2048] [--chunk 32]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force CPU: the camera rates are noise-free means; this must never
# contend with (or wait on) the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

# Tier boundaries and per-pixel PRNG-word cost (= Knuth/Bernoulli rounds;
# PTRS attempts draw 2 words each), mirroring store_poisson_tiered.
TIERS = [
    ("zero", 0.0, 0),          # max <= 0: no PRNG, pure store
    ("dark", 1e-3, 1),         # one-uniform Bernoulli
    ("dim", 1.5, 10),          # Knuth 10 rounds
    ("mid", 10.0, 24),         # Knuth 24 rounds
    ("bright", np.inf, 44),    # Knuth 24 + PTRS 10 attempts x 2 words
]


def knuth_rounds_needed(m, p_trunc: float = 5e-5):
    """Smallest r with P(Poisson(m) > r) < p_trunc (truncation bound of
    the Knuth product method at per-sub-block max rate ``m``).
    Vectorized over an array of maxes; capped at 64 rounds."""
    m = np.asarray(m, np.float64)
    term = np.exp(-m)
    cdf = term.copy()
    needed = np.zeros(m.shape, np.int64)
    open_ = np.ones(m.shape, bool)
    for r in range(1, 65):
        open_ &= (1.0 - cdf) >= p_trunc
        if not open_.any():
            break
        needed[open_] = r
        term = term * (m / r)
        cdf = cdf + term
    return needed


def tier_mix(size: int, chunk: int, rescan_factor: float = 1.5,
             depletion: float = 8.0):
    import jax.numpy as jnp

    from rescan_line_sted_tpu.config import Grid, LineSTEDParams, \
        RescanGeometry
    from rescan_line_sted_tpu.data import samples
    from rescan_line_sted_tpu.imaging.line_sted import effective_line_profile
    from rescan_line_sted_tpu.imaging.rescan import _illum_band
    from rescan_line_sted_tpu.kernels import fftconv
    from rescan_line_sted_tpu.kernels.rescan_banded_fused import (
        _sub_rows, pick_lane)
    from rescan_line_sted_tpu.physics import psf as psfs

    # bench_large_fov_per_step config (bench.py LINE_KW)
    params = LineSTEDParams.create(
        depletion=depletion, sigma_exc=3.0, sigma_det=3.0,
        stripe_period=12.0, slit_halfwidth=4.0, brightness=1.0)
    geom = RescanGeometry(Grid(size, size), rescan_factor=rescan_factor,
                          chunk=chunk)
    sample = np.asarray(samples.siemens_star((size, size)), np.float64)
    w = h = size
    b = geom.binning
    d_in, d_out = _illum_band(params, w, chunk, b)
    dob = d_out // b

    # kernel stage-1/2 tables (rescan_banded_fused lines ~391-407)
    eff = np.asarray(effective_line_profile(w, params), np.float64) \
        * params.brightness
    gx = np.asarray(psfs.detection_profile(w, params.sigma_det), np.float64)
    otf_y = fftconv.profile_to_otf1d(
        psfs.detection_profile(h, params.sigma_det))
    sample_y = np.asarray(fftconv.convolve_otf1d(
        jnp.asarray(sample, jnp.float32), otf_y, axis=-2, n=h), np.float64)

    ci = np.arange(chunk)[:, None]
    di = np.arange(d_in)[None, :]
    ill_w = eff[(w // 2 + di - (d_in - chunk) // 2 - ci) % w]
    g0w = np.asarray(fftconv.circulant_window(
        jnp.asarray(gx, jnp.float32), d_out, d_in,
        (d_out - chunk) // 2, (d_in - chunk) // 2), np.float64)
    swb = (g0w[None] * ill_w[:, None, :]).reshape(
        chunk, dob, b, d_in).sum(2).reshape(chunk * dob, d_in)

    s_in = (d_in - chunk) // 2
    sample_t = sample_y.T
    sample_ext = np.concatenate(
        [sample_t[w - s_in:] if s_in else sample_t[:0],
         sample_t, sample_t[:d_in - s_in]], axis=0)

    hb = h // b
    lane = pick_lane(hb)
    n_tiles = hb // lane
    sub = _sub_rows(chunk * dob)
    n_sub = (chunk * dob) // sub
    n_chunks = w // chunk

    px_sub = sub * lane
    swb32 = swb.astype(np.float32)
    ext32 = sample_ext.astype(np.float32)
    maxes = []
    for ic in range(n_chunks):
        win = ext32[ic * chunk: ic * chunk + d_in]           # [Di, H]
        cam = np.maximum(swb32 @ win, 0.0)                   # [C*dob, H]
        blocks = cam.reshape(n_sub, sub, n_tiles, lane)
        maxes.append(blocks.max(axis=(1, 3)).ravel())        # [n_sub*n_tiles]
    maxes = np.concatenate(maxes)

    counts = {name: 0 for name, _, _ in TIERS}
    words = {name: 0 for name, _, _ in TIERS}
    for name, hi, wpp in TIERS:
        if name == "zero":
            sel = maxes <= 0.0
            lo = 0.0
        elif name == "dark":
            sel = (maxes > 0.0) & (maxes < hi)
            lo = hi
        else:
            sel = (maxes >= lo) & (maxes < hi)
            lo = hi
        counts[name] = int(sel.sum())
        words[name] = int(counts[name]) * wpp * px_sub
    knuth_sel = (maxes >= 1e-3) & (maxes < 10.0)
    adaptive_rounds = int(knuth_rounds_needed(maxes[knuth_sel]).sum())

    # CDF-inversion ladder (the shipping sampler): per-pixel cost is ONE
    # uniform + one exp + kmax inversion terms, kmax graded to the
    # sub-block max (poisson_pallas._INV_TIERS)
    from rescan_line_sted_tpu.kernels.poisson_pallas import _INV_TIERS
    inv_blocks = {}
    inv_terms = 0
    lo = 1e-3
    for hi, kmax in _INV_TIERS:
        nblk = int(((maxes >= lo) & (maxes < hi)).sum())
        inv_blocks[f"k{kmax}"] = nblk
        inv_terms += nblk * kmax
        lo = hi
    total_sub = maxes.size
    out = dict(
        size=size, chunk=chunk, d_in=d_in, d_out=d_out, lane=lane,
        sub_rows=sub, n_subblocks=total_sub,
        pixels_per_subblock=px_sub,
        tier_counts=counts,
        prng_words_per_image=int(sum(words.values())),
        tier_words=words,
        camera_pixels=w * dob * hb,
        max_rate=float(maxes.max()),
        median_nonzero_max=float(np.median(maxes[maxes > 0]))
        if (maxes > 0).any() else 0.0,
        # Knuth rounds: fixed tiers today vs the per-sub-block adaptive
        # count (truncation < 5e-5 at each block's OWN max) -- the gap is
        # the headroom a finer tier ladder / runtime round count can win
        fixed_knuth_round_blocks=int(
            sum(counts[n] * w_ for n, _, w_ in TIERS
                if n in ("dim", "mid"))),
        adaptive_knuth_round_blocks=int(adaptive_rounds),
        # shipping inversion-ladder counts (per image): sampled pixels
        # draw 1 uniform + 1 exp each; term-blocks at graded kmax
        inv_tier_blocks=inv_blocks,
        inv_term_px=int(inv_terms) * px_sub,
        sampled_px=(total_sub - counts["zero"]) * px_sub,
        # placement-loop window accumulations (lo + wrap-split hi): one
        # roll+add of the [w_pad, lane] window per position per lane tile
        placement_windows=w * (hb // lane),
        # conv-stage MACs: the [C*dob, d_in] x [d_in, lane] matmul over
        # all (chunk, lane-tile) grid steps = W * dob * d_in * H/b
        conv_macs=w * dob * d_in * hb,
    )
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--rescan-factor", type=float, default=1.5)
    args = ap.parse_args()
    res = tier_mix(args.size, args.chunk, args.rescan_factor)
    print("TIER_MIX " + json.dumps(res))
    rp = res["tier_counts"]
    print(f"\nsub-blocks: {res['n_subblocks']} of "
          f"{res['pixels_per_subblock']} px "
          f"(lane={res['lane']}, sub_rows={res['sub_rows']})")
    for name, hi, wpp in TIERS:
        print(f"  {name:7s} (<{hi:g}): {rp[name]:7d} blocks, "
              f"{wpp:3d} words/px -> {res['tier_words'][name]/1e6:9.1f} "
              "Mwords")
    print(f"total PRNG words/image: {res['prng_words_per_image']/1e6:.0f} M"
          f" over {res['camera_pixels']/1e6:.0f} M camera px")
    fx, ad = res["fixed_knuth_round_blocks"], res["adaptive_knuth_round_blocks"]
    if fx:
        print(f"Knuth round-blocks: fixed tiers {fx}, per-block adaptive "
              f"{ad} ({ad/fx:.2%} of fixed -> "
              f"{(1-ad/fx):.0%} headroom)")
