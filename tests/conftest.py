"""Test environment: run JAX on a virtual 8-device CPU mesh.

Tests exercise the full engine (including mesh/sharding code paths) without
TPU hardware; the benchmark harness (`bench.py`) runs on the real chip.
Environment must be set before the first `import jax` anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The experimental 'axon' TPU plugin registers itself even when JAX_PLATFORMS
# requests cpu; force the config (must happen before first backend use).
# Set RLS_TEST_TPU=1 to run the suite on attached TPU hardware instead
# (slower: every program compiles through the remote tunnel).
import jax  # noqa: E402

if not os.environ.get("RLS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # On hardware every test subprocess pays tunnel compiles from scratch;
    # the persistent cache cuts repeat program compiles ~70x (measured in
    # utils/observability.enable_compilation_cache) across the
    # one-process-per-file scorecard run (scripts/run_tpu_tests.py).
    from rescan_line_sted_tpu.utils import enable_compilation_cache

    # tiny-grid test programs each compile in ~1-4 s through the tunnel
    # (dozens per file) -- cache them all, not just the >= 5 s defaults
    enable_compilation_cache(min_compile_secs=0.1)
