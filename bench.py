"""End-to-end verification-sweep benchmark on the TPU (driver contract).

Workload: the LOMGRID trial profile from BASELINE.md — 3,541 unique
utterances of 3 s each through the flagship E-TDNN system (MFCC-24 on
device → x-vector extraction → L2-norm), then 20,000 trial cosines scored
as one batched gather+dot: exactly the deeplip_tpu production path.

The synthetic PCM is generated on device (the DSP/model work is identical
to real speech); production overlaps wav IO with compute via
ThreadedPrefetcher, and this rig's host↔device relay has multi-second
first-transfer stalls that would otherwise dominate the measurement. Only
the final 20k scores leave the device.

Prints ONE JSON line:
  {"metric": "verification_trials_per_sec", "value": ..., "unit":
   "trials/sec", "vs_baseline": ...}

``vs_baseline`` divides by the reference-equivalent CPU PyTorch pipeline
measured on this host by ``benchmarks/reference_cpu_baseline.py``
(per-utterance batch-1 extraction + per-trial sklearn scoring loop):
165.8 trials/sec (measured 2026-08-16; re-run that script to refresh).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

# per-profile CPU baselines from benchmarks/reference_cpu_baseline.py
# (0.0316 s/utt extraction + 0.43 ms/trial scoring, extrapolated per sweep)
# BENCH_PROFILE=grid sweeps the GRID-scale workload (25,834 unique utts)
_PROFILE = os.environ.get("BENCH_PROFILE", "lomgrid")
REFERENCE_CPU_TRIALS_PER_SEC = 24.2 if _PROFILE == "grid" else 165.8
N_UNIQUE_UTTS = 25834 if _PROFILE == "grid" else 3541
N_TRIALS = 20000
UTT_SECONDS = 3.0
RATE = 16000
BATCH = 256
if os.environ.get("BENCH_SMOKE"):  # tiny CI smoke of the driver contract
    N_UNIQUE_UTTS, N_TRIALS, UTT_SECONDS, BATCH = 48, 96, 0.5, 16


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat driver runs skip recompilation
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
    from deeplip_tpu.models.tdnn import SpeakerEmbNet
    from deeplip_tpu.ops import features as F
    from deeplip_tpu.ops.framing import num_frames
    from deeplip_tpu.train.audio import masked_cmvn

    feat_cfg = F.FeatureConfig.from_config(AUDIO_DATA_OPTS)
    raw_cfg = dataclasses.replace(feat_cfg, normalize=False)
    model = SpeakerEmbNet.from_config(ETDNN_MODEL_OPTS)

    n_samples = int(UTT_SECONDS * RATE)
    t_frames = num_frames(n_samples, feat_cfg.frame_len, feat_cfg.frame_step)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t_frames, 24), jnp.float32)
    )
    lengths = jnp.full((BATCH,), t_frames, jnp.int32)

    def embed_batch(variables, key):
        # 'high' matmul precision: the parity-grade extraction path (bf16
        # default would be ~8e-4 off the reference embeddings)
        with jax.default_matmul_precision("high"):
            pcm = 0.1 * jax.random.normal(key, (BATCH, n_samples), jnp.float32)
            feats = F.extract_features(pcm, raw_cfg)
            feats = masked_cmvn(feats, lengths)
            xv, _ = model.apply(
                variables, feats, lengths=lengths, method=model.extract_embedding
            )
            return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

    @jax.jit
    def sweep(variables, keys, pairs):
        # the whole extraction sweep + scoring in ONE device program:
        # lax.map sequences the batches on device, removing per-batch host
        # dispatch latency (material through this rig's stdio relay)
        embs = jax.lax.map(lambda k: embed_batch(variables, k), keys)
        e = embs.reshape(-1, embs.shape[-1])[:N_UNIQUE_UTTS]
        a = jnp.take(e, pairs[:, 0], axis=0)
        b = jnp.take(e, pairs[:, 1], axis=0)
        return jnp.sum(a * b, axis=-1)

    n_batches = -(-N_UNIQUE_UTTS // BATCH)
    keys = jax.random.split(jax.random.PRNGKey(1), n_batches)
    rng = np.random.default_rng(0)
    pairs = jnp.asarray(rng.integers(0, N_UNIQUE_UTTS, (N_TRIALS, 2)), jnp.int32)

    # warm-up: compile and absorb the relay's first-transfer stall
    _ = np.asarray(sweep(variables, keys, pairs)[:8])

    t0 = time.perf_counter()
    scores = sweep(variables, keys, pairs)
    scores.block_until_ready()
    elapsed = time.perf_counter() - t0
    scores_host = np.asarray(scores)
    assert scores_host.shape == (N_TRIALS,) and np.all(np.isfinite(scores_host))

    trials_per_sec = N_TRIALS / elapsed
    print(
        json.dumps(
            {
                "metric": "verification_trials_per_sec",
                "value": round(trials_per_sec, 1),
                "unit": "trials/sec",
                "vs_baseline": round(trials_per_sec / REFERENCE_CPU_TRIALS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
