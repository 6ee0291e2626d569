"""Multi-host (multi-process) initialization and DCN-aware meshes.

The reference has no multi-node story at all — its only parallelism is
single-process ``torch.nn.DataParallel`` (``train_audio.py:79-83``). The
TPU-native scale-out path is:

- per-host process launch → :func:`initialize` (``jax.distributed``) makes
  every host see the global device set;
- :func:`make_multihost_mesh` builds a ``(dcn, data)`` mesh with hosts on
  the outer axis, so XLA decomposes gradient all-reduces hierarchically:
  reduce-scatter/all-gather over ICI within a slice, the small cross-host
  hop over DCN;
- the existing trainers take the mesh as-is — batch sharded over
  ``("dcn", "data")`` (see :func:`dp_spec`), parameters replicated.

On TPU pods ``jax.distributed.initialize()`` auto-discovers coordinator and
process ids from the TPU metadata; on CPU (tests, this rig) the caller
passes them explicitly and the gloo collectives backend is selected. The
2-process CPU path is exercised by ``tests/test_distributed.py``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DCN_AXIS = "dcn"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize ``jax.distributed`` for a multi-process run.

    No-op for single-process runs (everything is None and no cluster env is
    present). On CPU backends the gloo cross-process collectives
    implementation is selected (the default 'none' cannot communicate).
    """
    if coordinator_address is None and num_processes is None and process_id is None:
        # TPU pod / cluster env: jax auto-detects. Plain single process: skip.
        import os

        if not any(k in os.environ for k in (
            "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
            "JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
        )):
            return
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # flag renamed/absent: TPU backends don't need it
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    data_axis: str = "data", dcn_axis: str = DCN_AXIS
) -> Mesh:
    """``(dcn, data)`` mesh: process (host) index on the outer axis, that
    host's devices on the inner — collectives ride ICI on the inner axis and
    cross DCN only on the (process-count-sized) outer one.

    Single-process: a ``(1, n_local)`` mesh, so the same trainer code and
    ``dp_spec`` work unchanged.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = len({d.process_index for d in devices})
    grid = np.array(devices).reshape(n_proc, -1)
    return Mesh(grid, (dcn_axis, data_axis))


def dp_spec(mesh: Mesh, ndim: int = 1) -> P:
    """Batch PartitionSpec over every data-parallel mesh axis present."""
    axes = tuple(n for n in mesh.axis_names if n in (DCN_AXIS, "data"))
    return P(axes if len(axes) > 1 else axes[0], *([None] * (ndim - 1)))
