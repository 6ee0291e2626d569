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
    training steps do);
  - chain through a reduction of the FULL output (``sum(y)``), never a
    single-element tap (``y[0]``): XLA pushes slices back through
    elementwise/BN/conv ops and computes only the sliced window — fwd-only
    fori loops chained via ``y.ravel()[0]`` measured ~0 ms on real conv
    blocks (r4, benchmarks/extract_attribution.py) because the measured
    work was sliced away, not because it was fast;
  - per-dispatch relay RTT here is ~30-60 ms (measured r4 by
    serve_bench.py and the headline-sweep attribution): anything
    host-dispatched per iteration measures the tunnel, not the chip — put
    the loop inside ONE program and two-length-fit the iteration count.

On a normal PCIe-attached device this harness is simply a correct
synchronous measurement (the fetch is what `block_until_ready` would be).
"""

from __future__ import annotations

from typing import Any


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
