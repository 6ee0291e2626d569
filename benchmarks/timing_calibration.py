"""Timing-methodology calibration for this rig's remote TPU tunnel.

Round-2 finding: on this environment's stdio-relay PJRT plugin,
``jax.block_until_ready`` does NOT wait for remote execution (a chained
4096^3 matmul loop "measured" 6,900 TFLOP/s — 35x the v5e's physical peak —
and the single D2H fetch afterwards took 9 minutes draining the queue).
Honest timing must bracket with a real device->host fetch and amortize the
relay round trip over enough chained iterations.

This script measures, with fetch-bracketed chained loops:
  - relay RTT (tiny fetch of an already-computed buffer)
  - per-iteration time of a known-FLOP matmul at two sizes and two chain
    lengths (consistency check: per-iter must be length-independent)

Run on the TPU: ``python benchmarks/timing_calibration.py``.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    def fetch(x):
        return np.asarray(jax.device_get(x[:1, :1]))

    results = {}

    # relay RTT on a tiny, already-materialized buffer
    tiny = jnp.ones((1, 1), jnp.float32)
    fetch(tiny)
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(tiny)
    rtt = (time.perf_counter() - t0) / 5
    results["rtt_ms"] = round(rtt * 1000, 1)

    def mm_loop(dim, iters):
        flops = 2 * dim**3
        w = jax.random.normal(jax.random.PRNGKey(0), (dim, dim), jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (dim, dim), jnp.bfloat16)

        @jax.jit
        def mm(x, w):
            y = x @ w
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-3)

        x = mm(x, w)
        fetch(x)  # compile + drain
        t0 = time.perf_counter()
        for _ in range(iters):
            x = mm(x, w)
        fetch(x)  # forces the whole dependent chain
        ms = (time.perf_counter() - t0 - rtt) / iters * 1000
        return round(ms, 3), round(flops / ms / 1e9, 1)

    for dim in (4096, 512):
        for iters in (8, 64):
            ms, tf = mm_loop(dim, iters)
            results[f"mm{dim}_n{iters}_ms"] = ms
            results[f"mm{dim}_n{iters}_tflops"] = tf
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
