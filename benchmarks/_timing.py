"""Honest timing on this rig's remote-tunnel TPU (and on normal devices).

On the stdio-relay PJRT plugin used here, ``jax.block_until_ready`` returns
before remote execution finishes (calibrated in
``benchmarks/timing_calibration.py``: a chained 4096^3 bf16 matmul loop
"timed" 6,900 TFLOP/s — 35x the chip's physical peak — with the block-based
recipe, vs 101 TFLOP/s with this harness). Only a device->host FETCH
provably waits for the work it depends on. Honest recipe:

  - CHAIN iterations (each step consumes the previous step's output) so no
    execution can be elided, deduplicated, or reordered out of the chain;
  - bracket the loop with a tiny fetch of the final state, which forces the
    whole dependent chain;
  - use enough iterations to amortize the per-loop fixed cost (~35-50 ms
    here) and per-dispatch overhead (~0.5 ms/execution).

  - keep each iteration's LIVE (non-donated) outputs tiny: the relay ships
    execution outputs device->host eagerly, so a loop that leaves a 50 MB
    array live per iteration measures the ~40 MB/s relay, not the TPU
    (reduce to a scalar inside the jit, or donate big buffers as the
    training steps do).

On a normal PCIe-attached device this harness is simply a correct
synchronous measurement (the fetch is what `block_until_ready` would be).
"""

from __future__ import annotations

import time
from typing import Any, Callable


def force_fetch(tree: Any) -> None:
    """Fetch one element of (a leaf of) ``tree`` device->host, forcing every
    execution the value depends on to complete."""
    import jax
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    leaf = leaves[0]
    flat = leaf.reshape(-1) if hasattr(leaf, "reshape") else leaf
    np.asarray(jax.device_get(flat[:1]))


def chained_ms(
    step: Callable[[Any], Any],
    state0: Any,
    iters: int = 30,
    warmup: int = 1,
) -> float:
    """Per-iteration wall time (ms) of ``state = step(state)`` chained
    ``iters`` times, fetch-forced. ``step`` must return a value that depends
    on every piece of work to be timed."""
    state = state0
    for _ in range(max(warmup, 1)):
        state = step(state)
    force_fetch(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    force_fetch(state)
    return (time.perf_counter() - t0) / iters * 1000


def loop_overhead_split(
    step: Callable[[Any], Any],
    state0: Any,
    short: int = 8,
    long: int = 40,
) -> dict:
    """Separate the fixed per-loop cost from the true per-iteration cost by
    running two chain lengths: total(n) = fixed + n*t."""
    ms_short = chained_ms(step, state0, iters=short)
    ms_long = chained_ms(step, state0, iters=long)
    t = (long * ms_long - short * ms_short) / (long - short)
    fixed = short * (ms_short - t)
    return {
        "ms_per_iter": round(t, 3),
        "fixed_ms": round(fixed, 1),
        "ms_short": round(ms_short, 3),
        "ms_long": round(ms_long, 3),
    }
