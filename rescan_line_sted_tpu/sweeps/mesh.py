"""Mesh-aware sweep execution (SURVEY.md section 3, C16).

The mesh machinery lives in ``parallel/mesh.py`` (it is used by more than
sweeps); this module re-exports it under the path named in the survey's
build-mapping table and adds the sweep-specific convenience.
"""

from __future__ import annotations

import jax

from rescan_line_sted_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)


def run_sharded_sweep(sweep_fn, mesh, sample, batched_args, *args):
    """Jit ``sweep_fn(sample, *batched_args, *args)`` with the sweep axis
    sharded over the mesh "batch" axis and the sample replicated."""
    sample = replicate(mesh, sample)
    batched_args = tuple(shard_batch(mesh, a) for a in batched_args)
    return jax.jit(sweep_fn)(sample, *batched_args, *args)
