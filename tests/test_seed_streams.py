"""Per-device PRNG stream separation for the banded-fused kernel.

r4 VERDICT weak #7: ``parallel.sharded_rescan`` strides each device's seed
stream by ``kernels.rescan_banded_fused.seeds_consumed`` so per-device
in-kernel Poisson draws never collide -- but no test pinned the exported
accounting to the kernel's ACTUAL seed consumption, so a lane/sub-row
policy change inside the kernel could silently drift the stride and
reproduce correlated noise across shards.

These tests instrument the kernel (interpret mode, CPU): the sampler entry
point ``store_poisson_tiered`` is replaced by a spy that records every
seed index the kernel passes (via ``jax.debug.callback`` -- the indices
are traced scalars inside the kernel's ``fori_loop``) and writes the rates
through unchanged. The recorded set must be EXACTLY ``range(
seeds_consumed(...))`` -- every index used once, none outside the stride
-- under the default policy AND under the RLS_BANDED_LANE /
RLS_BANDED_SUB_ROWS experiment overrides. A two-stream run at the
sharded engine's device stride must then be disjoint and contiguous.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# the kernels package re-exports FUNCTIONS under these names; go through
# importlib for the modules themselves (monkeypatch targets)
poisson_pallas = importlib.import_module(
    "rescan_line_sted_tpu.kernels.poisson_pallas")
rbf = importlib.import_module(
    "rescan_line_sted_tpu.kernels.rescan_banded_fused")

# a directly-parameterized kernel config (small, interpret-friendly):
# chunk % 8 == 0, chunk <= d_in < W, (chunk * dob) % sub_rows == 0,
# w_pad = round_up(dob, 8) + 8 <= wc
W, H, CHUNK, D_IN, D_OUT, WC = 64, 256, 16, 32, 32, 128


def _run_instrumented(monkeypatch, seed_hi, hb=None, env=None):
    """Run the noisy banded kernel in interpret mode with the sampler
    spied out; return the seed indices it consumed (in call order)."""
    recorded = []
    orig = poisson_pallas.store_poisson_tiered

    def spy(out_ref, rows, lam, seed):
        seeds = seed if isinstance(seed, tuple) else (seed,)
        jax.debug.callback(lambda v: recorded.append(int(v)), seeds[-1])
        out_ref[rows, :] = lam  # pass-through: no PRNG in interpret mode

    monkeypatch.setattr(poisson_pallas, "store_poisson_tiered", spy)
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    h = hb or H
    key = jax.random.key(3)
    sample_y = jax.random.uniform(key, (h, W), jnp.float32)
    eff = jnp.exp(-0.5 * ((jnp.arange(W) - W // 2) / 3.0) ** 2)
    gx = jnp.exp(-0.5 * ((jnp.arange(W) - W // 2) / 2.0) ** 2)
    offsets = jnp.arange(W, dtype=jnp.int32)
    out = rbf.rescan_banded_fused(
        sample_y, eff, gx, offsets, wc=WC, d_in=D_IN, d_out=D_OUT,
        chunk=CHUNK, seed=jnp.asarray([0, seed_hi], jnp.int32),
        interpret=True)
    jax.block_until_ready(out)
    monkeypatch.setattr(poisson_pallas, "store_poisson_tiered", orig)
    return recorded


@pytest.mark.parametrize("env", [
    {},                                   # default lane / sub-row policy
    {"RLS_BANDED_SUB_ROWS": "32"},        # finer sampler sub-blocks
    {"RLS_BANDED_LANE": "64"},            # narrower canvas lane tiles
])
def test_kernel_consumes_exactly_seeds_consumed(monkeypatch, env):
    """The kernel's actual seed indices are exactly [0, seeds_consumed):
    each used once, none outside the exported stride -- whatever
    lane/sub-row policy is active (the accounting can never drift from
    the kernel)."""
    recorded = _run_instrumented(monkeypatch, seed_hi=0, env=env)
    expect = rbf.seeds_consumed(w=W, chunk=CHUNK, dob=D_OUT, hb=H)
    assert len(recorded) == expect
    assert sorted(recorded) == list(range(expect))


def test_two_device_strides_are_disjoint_and_contiguous(monkeypatch):
    """Two per-device streams at the sharded engine's stride (device d
    adds d * seeds_consumed(per-device rows) to seed[1], see
    parallel/sharded_rescan.py): their consumed index sets must be
    disjoint and tile [0, 2 * stride) with no gap a third device's
    stream could collide into."""
    h_loc = H // 2  # two "devices", H rows split evenly
    stride = rbf.seeds_consumed(w=W, chunk=CHUNK, dob=D_OUT, hb=h_loc)
    dev0 = _run_instrumented(monkeypatch, seed_hi=0, hb=h_loc)
    dev1 = _run_instrumented(monkeypatch, seed_hi=stride, hb=h_loc)
    s0, s1 = set(dev0), set(dev1)
    assert len(s0) == len(dev0) and len(s1) == len(dev1)  # no repeats
    assert not (s0 & s1)
    assert s0 | s1 == set(range(2 * stride))


def test_sharded_engine_strides_by_kernel_accounting(monkeypatch):
    """The sharded engine's per-device stride is the kernel's OWN
    accounting evaluated at the PER-DEVICE row block: spy on the
    ``seeds_consumed`` call ``rescanned_line_sted_sharded`` makes (the
    engine imports it at call time) and pin its arguments and result --
    a hand-copied stride constant, or a stride computed at the GLOBAL
    block, would reproduce correlated noise across shards and fail
    here."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rescan_line_sted_tpu.config import (Grid, RescanGeometry,
                                             RescanParams)
    from rescan_line_sted_tpu.data import samples
    from rescan_line_sted_tpu.parallel.sharded_rescan import (
        rescanned_line_sted_sharded,
    )

    calls = []
    orig = rbf.seeds_consumed

    def spy(**kw):
        calls.append(kw)
        return orig(**kw)

    monkeypatch.setattr(rbf, "seeds_consumed", spy)
    n_dev = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("space",))
    w = 192  # smallest grid where the 128-aligned band windows engage
    params = RescanParams.create(sigma_exc=1.2, sigma_det=1.2,
                                 depletion=4.0, brightness=50.0)
    geom = RescanGeometry(Grid(w, w), rescan_factor=2.0, chunk=16)
    sample = jax.device_put(samples.siemens_star((w, w)),
                            NamedSharding(mesh, P("space", None)))
    out = rescanned_line_sted_sharded(sample, params, geom, mesh)
    jax.block_until_ready(out.image)
    assert len(calls) == 1, calls
    kw = calls[0]
    assert kw["hb"] == w // n_dev  # PER-DEVICE rows, not the global block
    assert kw["w"] == w and kw["chunk"] == 16


def test_noise_free_path_consumes_no_seeds(monkeypatch):
    """seed=None must never touch the sampler (collapsed-mode callers
    draw once on the accumulated canvas instead)."""
    recorded = []

    def spy(out_ref, rows, lam, seed):
        recorded.append(True)
        out_ref[rows, :] = lam

    monkeypatch.setattr(poisson_pallas, "store_poisson_tiered", spy)
    key = jax.random.key(5)
    sample_y = jax.random.uniform(key, (H, W), jnp.float32)
    eff = jnp.exp(-0.5 * ((jnp.arange(W) - W // 2) / 3.0) ** 2)
    gx = jnp.exp(-0.5 * ((jnp.arange(W) - W // 2) / 2.0) ** 2)
    out = rbf.rescan_banded_fused(
        sample_y, eff, gx, jnp.arange(W, dtype=jnp.int32), wc=WC,
        d_in=D_IN, d_out=D_OUT, chunk=CHUNK, seed=None, interpret=True)
    jax.block_until_ready(out)
    assert recorded == []
