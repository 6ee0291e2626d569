"""Fused-feature kernel shootout: XLA matmul path vs Pallas v1/v2 kernels.

Times the PCM→MFCC front-end (no CMVN/deltas — identical across backends)
at the round-1 bench shape (128 × 3 s utterances) and the training shape
(256 × ~3 s crops), at each precision mode. Prints one JSON line per cell.

Run on the TPU: ``python benchmarks/pallas_bench.py``.
"""

import json
import sys
import time

import numpy as np

N_ITERS = 100


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.ops.features import FeatureConfig, mfcc
    from deeplip_tpu.ops.pallas.fbank_kernel import (
        _pallas_features_v1,
        _pallas_features_v2,
        _v2_eligible,
    )

    rng = np.random.default_rng(0)

    for precision in (sys.argv[1].split(",") if len(sys.argv) > 1 else
                      ["high", "highest", "default"]):
        cfg = FeatureConfig(feat_type="mfcc", num_cep=24, num_bin=26,
                            normalize=False, delta=False, precision=precision)
        for batch, samples in ((128, 48000), (256, 48000)):
            pcm = jax.device_put(
                rng.standard_normal((batch, samples)).astype(np.float32))

            xla = jax.jit(lambda x: mfcc(x, cfg))
            v1 = lambda x: _pallas_features_v1(x, cfg)
            v2 = (lambda x: _pallas_features_v2(x, cfg)) if _v2_eligible(cfg) else None

            from benchmarks._timing import force_fetch

            ref = None
            for name, fn in (("xla", xla), ("pallas_v1", v1), ("pallas_v2", v2)):
                if fn is None:
                    continue
                out = fn(pcm)
                if ref is None:
                    ref = np.asarray(out)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(np.asarray(out) - ref)))
                # chained loop timed to a forcing fetch, with the output
                # reduced to ONE scalar inside the jit — large per-iteration
                # outputs are shipped device->host eagerly by this rig's
                # relay and poison the timing (benchmarks/_timing.py). The
                # subnormal feedback preserves values while chaining.
                fn_sum = jax.jit(lambda x, eps: jnp.sum(fn(x + eps * 1e-38)))
                s = fn_sum(pcm, jnp.float32(0))
                force_fetch(s)
                t0 = time.perf_counter()
                for _ in range(N_ITERS):
                    s = fn_sum(pcm, s)
                force_fetch(s)
                ms = (time.perf_counter() - t0) / N_ITERS * 1000
                print(json.dumps({
                    "backend": name, "precision": precision, "batch": batch,
                    "ms": round(ms, 3),
                    "utts_per_sec": round(batch / ms * 1000, 1),
                    "max_abs_err_vs_xla": err,
                }), flush=True)


if __name__ == "__main__":
    main()
