"""Matmul-precision ladder for the extraction path: embedding error vs
'highest' and honest per-batch time at each precision (BENCH.md table).

Run on the TPU: ``python benchmarks/precision_ladder.py``.
"""

import json
import sys
import time

import numpy as np

BATCH = 64
SECONDS = 3.0
RATE = 16000
N_ITERS = 40


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
    from benchmarks._timing import force_fetch
    from deeplip_tpu.models.tdnn import SpeakerEmbNet
    from deeplip_tpu.ops import features as F
    from deeplip_tpu.ops.framing import num_frames

    feat_cfg = F.FeatureConfig.from_config(AUDIO_DATA_OPTS)
    model = SpeakerEmbNet.from_config(ETDNN_MODEL_OPTS)
    n_samples = int(SECONDS * RATE)
    t_frames = num_frames(n_samples, feat_cfg.frame_len, feat_cfg.frame_step)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t_frames, 24), jnp.float32))
    pcm = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, n_samples), jnp.float32)

    def make_embed(precision):
        @jax.jit
        def embed(variables, pcm):
            with jax.default_matmul_precision(precision):
                feats = F.extract_features(pcm, feat_cfg)
                xv, _ = model.apply(variables, feats,
                                    method=model.extract_embedding)
                return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

        @jax.jit
        def embed_sum(variables, pcm, eps):
            # eps chains iterations (value-preserving subnormal add inside
            # the jit); scalar output so nothing big stays live per
            # iteration (benchmarks/_timing.py)
            with jax.default_matmul_precision(precision):
                feats = F.extract_features(pcm + eps * 1e-38, feat_cfg)
                xv, _ = model.apply(variables, feats,
                                    method=model.extract_embedding)
                return jnp.sum(xv)

        return embed, embed_sum

    ref = np.asarray(make_embed("highest")[0](variables, pcm))
    for precision in ("default", "high", "highest"):
        embed, embed_sum = make_embed(precision)
        err = float(np.max(np.abs(np.asarray(embed(variables, pcm)) - ref)))
        s = embed_sum(variables, pcm, jnp.float32(0))
        force_fetch(s)
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            s = embed_sum(variables, pcm, s)
        force_fetch(s)
        ms = (time.perf_counter() - t0) / N_ITERS * 1000
        print(json.dumps({
            "precision": precision, "batch": BATCH,
            "ms_per_batch": round(ms, 2),
            "utts_per_sec": round(BATCH / ms * 1000, 1),
            "max_abs_err_vs_highest": err,
        }), flush=True)


if __name__ == "__main__":
    main()
