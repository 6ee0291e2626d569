"""Checkpointing: per-epoch saves, resume, finetune, and last-N averaging.

Mirrors the reference's checkpoint contract (SURVEY.md §5):

- per-epoch ``net_<epoch>`` saves of ``{epoch, params, batch_stats,
  opt_state}`` (≙ ``train_audio.py:261-264``),
- resume restores weights + epoch but not the optimizer (the reference
  comments that restore out, ``train_audio.py:271-273``; here opt_state
  restore is available but off by default for parity),
- checkpoint averaging of the last N epochs into ``net_avg``
  (≙ ``model_average``, ``train_audio.py:216-232``; N=4 audio, N=2 fusion).

Storage is Orbax (async-capable, sharding-aware — restores place arrays
straight onto the mesh); paths follow the reference's
``exp/<log_time>/net_<epoch>`` layout so tooling maps 1:1.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def fetch_tree(tree: Any) -> Any:
    """Device→host fetch of a pytree as ONE packed transfer per dtype.

    Per-leaf ``np.asarray`` costs a device round-trip per array — through a
    high-latency link (e.g. this rig's TPU tunnel) a flagship checkpoint is
    ~150 leaves ≈ minutes. Packing all same-dtype leaves into one device
    concatenation makes it a handful of transfers (measured: 155 s → ~2 s).
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    by_dtype: dict = {}
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        by_dtype.setdefault(str(arr.dtype), []).append((i, arr))
    out: list = [None] * len(leaves)
    for _dtype, items in by_dtype.items():
        flats = [a.ravel() for _, a in items]
        packed = np.asarray(jnp.concatenate(flats)) if len(flats) > 1 else np.asarray(flats[0])
        off = 0
        for (i, a), f in zip(items, flats):
            n = f.shape[0]
            out[i] = packed[off : off + n].reshape(a.shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _ckpt_dir(exp_dir: str, tag: str | int) -> str:
    name = f"net_{tag}" if not isinstance(tag, str) or not tag.startswith("net") else tag
    return os.path.join(os.path.abspath(exp_dir), name)


_async_checkpointer: ocp.AsyncCheckpointer | None = None


def _get_async() -> ocp.AsyncCheckpointer:
    global _async_checkpointer
    if _async_checkpointer is None:
        _async_checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_checkpointer


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint writes land."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def save_checkpoint(
    exp_dir: str, tag: str | int, tree: Any, asynchronous: bool = False
) -> str:
    """Write ``net_<tag>``; ``asynchronous=True`` returns immediately and the
    write overlaps subsequent compute (call :func:`wait_for_saves` — done
    automatically before any load — to ensure durability)."""
    path = _ckpt_dir(exp_dir, tag)
    if asynchronous:
        ckptr = _get_async()
        ckptr.wait_until_finished()  # at most one write in flight
        ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
        return path
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(exp_dir: str, tag: str | int, abstract_tree: Any | None = None) -> Any:
    wait_for_saves()
    path = _ckpt_dir(exp_dir, tag)
    ckptr = ocp.StandardCheckpointer()
    if abstract_tree is None:
        return ckptr.restore(path)
    return ckptr.restore(path, abstract_tree)


def latest_checkpoint(exp_dir: str) -> int | None:
    """Highest numeric ``net_<epoch>`` present in ``exp_dir``."""
    if not os.path.isdir(exp_dir):
        return None
    epochs = [
        int(m.group(1))
        for name in os.listdir(exp_dir)
        if (m := re.fullmatch(r"net_(\d+)", name))
    ]
    return max(epochs) if epochs else None


def average_checkpoints(exp_dir: str, epochs: list[int], out_tag: str = "avg") -> Any:
    """Elementwise mean of the saved trees' ``params``/``batch_stats`` over
    ``epochs``; writes ``net_<out_tag>`` and returns the averaged tree."""
    trees = [load_checkpoint(exp_dir, e) for e in epochs]

    def mean_leaves(*leaves):
        dtype = np.asarray(leaves[0]).dtype
        if np.issubdtype(dtype, np.floating):
            total = sum(np.asarray(l, np.float64) for l in leaves)
            return (total / len(leaves)).astype(dtype)
        return leaves[0]

    avg = dict(trees[0])
    for key in ("params", "batch_stats"):
        if key in avg and avg[key] is not None:
            avg[key] = jax.tree_util.tree_map(
                mean_leaves, *[t[key] for t in trees]
            )
    save_checkpoint(exp_dir, out_tag, avg)
    return avg
