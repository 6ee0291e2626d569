"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
replication over up to 4 GPUs (``train_audio.py:79-83``). The TPU-native
answer is a ``jax.sharding.Mesh`` with the batch sharded on a ``data`` axis:
XLA inserts the gradient all-reduce over ICI, and the same code runs on 1
chip, a v4-8 slice, or (with a ``dcn`` outer axis) multi-host.

Models at this scale (≤ ~40 MB) need no tensor/pipeline parallelism, so the
mesh is 1-D by default, but :func:`make_mesh` accepts arbitrary axis layouts
so the training step stays shardable on (data, model) meshes if ever needed.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def force_host_devices(n: int) -> None:
    """Emulate an ``n``-device mesh on CPU (for tests / dry runs).

    Must run before JAX initializes its backends. This is the TPU analogue of
    "test multi-node without a cluster".
    """
    flags = os.environ.get("XLA_FLAGS", "")
    flag = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + flag).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def make_mesh(
    axes: Sequence[tuple[str, int]] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``axes`` is a list of ``(name, size)`` pairs; a size of ``-1`` means
    "all remaining devices". Default: 1-D data-parallel mesh over everything.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = [(DATA_AXIS, len(devices))]
    names = [a[0] for a in axes]
    sizes = [a[1] for a in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


DCN_AXIS = "dcn"


def param_sharding(mesh: Mesh, tree):
    """Pytree of shardings for a train state: classifier weights sharded
    over MODEL_AXIS, everything else replicated.

    The speaker-classifier weight ``(num_classes, emb_dim)`` of the margin
    softmax heads (``losses/softmax.py``) is the only parameter that grows
    with the corpus (production speaker sets reach 10⁵–10⁶ classes, ≫ the
    ~20 MB trunk), so it gets the classic Megatron-style output-parallel
    treatment: rows (classes) sharded over ``model``; the cross-entropy's
    logsumexp over the sharded class axis becomes one XLA-inserted psum.
    Optimizer-state leaves under the same ``criterion`` subtree match shape
    and shard identically; on a mesh without a ``model`` axis this is
    exactly :func:`replicated_sharding`.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model = sizes.get(MODEL_AXIS, 1)

    def leaf(path, x):
        if model > 1 and getattr(x, "ndim", 0) == 2 and x.shape[0] % model == 0:
            keys = {getattr(p, "key", getattr(p, "name", "")) for p in path}
            if "criterion" in keys:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, tree)


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data-parallel mesh axes;
    replicate the rest.

    On a multi-host ``(dcn, data)`` mesh (core/distributed.py) the batch is
    sharded over BOTH axes, so each host's devices hold distinct rows and
    XLA's gradient all-reduce decomposes hierarchically (ICI inner, DCN
    outer)."""
    if DCN_AXIS in mesh.axis_names and axis == DATA_AXIS:
        batch_axes: tuple | str = (DCN_AXIS, DATA_AXIS)
    else:
        batch_axes = axis
    spec = P(batch_axes, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def stacked_data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for ``(K, B, ...)`` stacks of K same-shape batches (grouped
    train steps, ``lax.scan`` over dim 0): dim 1 is the batch dimension,
    sharded like :func:`data_sharding`; the stack dim is replicated."""
    if DCN_AXIS in mesh.axis_names:
        batch_axes: tuple | str = (DCN_AXIS, DATA_AXIS)
    else:
        batch_axes = DATA_AXIS
    spec = P(None, batch_axes, *([None] * (ndim - 2)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())



def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return ((n + m - 1) // m) * m
