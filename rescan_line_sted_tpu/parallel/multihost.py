"""Multi-host (multi-process) initialization for pod-scale meshes.

SURVEY.md section 2.4: the reference (single-process numpy figure scripts,
see SURVEY.md section 1) has no distributed story; the TPU-native
equivalent of a communication backend is GSPMD over a global mesh. On a
TPU pod each host runs one process and sees only its local chips until
``jax.distributed.initialize`` stitches the processes into one runtime --
after that ``jax.devices()`` is global and the ``parallel.mesh`` helpers
(and everything jitted over their meshes) work unchanged, with XLA routing
collectives over ICI within a slice and DCN across slices.

Single-process safe: ``initialize_multihost()`` with no arguments and no
cluster environment is a no-op, so pipelines can call it unconditionally.

Usage (one call per process, before the first backend use)::

    from rescan_line_sted_tpu.parallel import initialize_multihost, make_mesh

    initialize_multihost()                       # env-driven (TPU pods)
    # or explicitly:
    initialize_multihost("10.0.0.1:8476", num_processes=4, process_id=rank)

    mesh = make_mesh({"batch": 8, "space": 4})   # now spans all hosts
"""

from __future__ import annotations

import jax


def is_initialized() -> bool:
    """True when the process is already part of a distributed runtime."""
    state = getattr(jax._src.distributed, "global_state", None)
    return bool(state is not None and state.client is not None)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None,
                         **kwargs) -> tuple[int, int]:
    """Join (or create) the distributed runtime; returns
    ``(process_index, process_count)``.

    * With arguments: explicit cluster wiring (coordinator host:port, world
      size, rank) -- any launcher (mpirun, SLURM, k8s) can drive it.
    * Without arguments: ``jax.distributed.initialize`` auto-detects the
      cluster from the environment (TPU pod metadata, SLURM/OMPI vars).
      When there is no cluster environment at all, auto-detection cannot
      identify a coordinator; that case is treated as single-process and
      the call is a NO-OP rather than an error, so single-chip runs and
      multi-host runs share one code path.
    * Idempotent: a second call returns the existing wiring.
    """
    if is_initialized():
        return jax.process_index(), jax.process_count()
    if coordinator_address is None and num_processes is None:
        try:
            from jax._src.clusters import ClusterEnv

            auto = ClusterEnv.auto_detect_unset_distributed_params(
                None, None, None, None, None, None)
        except Exception:
            auto = (None,)
        if not auto or auto[0] is None:
            return 0, 1  # no cluster environment: single process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return jax.process_index(), jax.process_count()


def local_device_slice(mesh, axis_name: str) -> tuple[int, int]:
    """Index range ``[lo, hi)`` of ``axis_name`` owned by THIS process.

    For host-side work (loading samples, writing per-shard TIFFs) that must
    touch only the shard a host will feed to ``jax.make_array_from_*``.
    """
    axis = mesh.axis_names.index(axis_name)
    size = mesh.devices.shape[axis]
    per = -(-size // max(jax.process_count(), 1))
    lo = min(jax.process_index() * per, size)
    return lo, min(lo + per, size)
