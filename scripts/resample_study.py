"""Measure the embedding-level cost of the GRID-leg resampler choice.

The reference resamples GRID's 44.1 kHz stereo audio with
``librosa.resample`` → resampy ``kaiser_best``
(`/root/reference/models/audio_models/datasets.py:462`); rounds 1-3 of this
repo used scipy ``resample_poly`` instead (a deliberate deviation,
PARITY.md). r4 implements kaiser_best natively
(``audio_io.resample(method='kaiser_best')``, golden-tested against the
vendored resampy kernel) and this study quantifies what the polyphase
deviation *cost* at the embedding level, through briefly-trained flagship
E-TDNN weights — the measurement VERDICT r3 (#4) asked for.

Protocol: train the flagship E-TDNN a few dozen steps on a synthetic 16 kHz
corpus (random-init embeddings collapse; trained weights are the regime the
1e-4 parity bar is defined on), synthesize GRID-style 44.1 kHz STEREO wavs,
extract embeddings through the production bucketed path twice — identical
except for the resampler — and compare embeddings and trial cosines.

Run on CPU:  PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
    python scripts/resample_study.py --out docs/resample_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the JSON report here")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--n-utts", type=int, default=24)
    args = ap.parse_args()

    import jax.numpy as jnp

    from __graft_entry__ import _train_config
    from deeplip_tpu.core.mesh import make_mesh
    from deeplip_tpu.data.audio_io import read_wav, resample, write_wav
    from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
    from deeplip_tpu.data.synthetic import make_audio_corpus, synth_utterance
    from deeplip_tpu.train.audio import AudioTrainer

    tmp = tempfile.mkdtemp(prefix="resample_study_")

    # --- briefly-trained flagship weights --------------------------------
    train_root = os.path.join(tmp, "train")
    make_audio_corpus(train_root, n_spk=8, utts_per_spk=4, duration=2.0)
    cfg = _train_config(bs=8)
    cfg.data["train_manifest"] = os.path.join(train_root, "manifest.csv")
    trainer = AudioTrainer(cfg, mesh=make_mesh(),
                           exp_root=os.path.join(tmp, "exp"))
    state = trainer.ensure_state()
    margin = jnp.float32(0.2)
    first = last = None
    batches = iter(trainer.pipeline.epoch(0))
    for step in range(args.steps):
        try:
            b = next(batches)
        except StopIteration:
            batches = iter(trainer.pipeline.epoch(step))
            b = next(batches)
        state, m = trainer._train_step(state, b["pcm"], b["labels"], margin)
        loss = float(m["loss"])
        first = loss if first is None else first
        last = loss
    trainer.state = state
    print(f"trained {args.steps} steps: loss {first:.3f} -> {last:.3f}",
          file=sys.stderr)

    # --- GRID-style eval wavs: 44.1 kHz stereo ---------------------------
    rng = np.random.default_rng(11)
    utts = []
    for i in range(args.n_utts):
        y = synth_utterance(rng, speaker_seed=2000 + i % 8,
                            duration=float(rng.uniform(1.5, 3.0)), rate=44100)
        stereo = np.stack([y, 0.92 * y + 0.002 * rng.standard_normal(len(y))
                           .astype(np.float32)], axis=1)
        p = os.path.join(tmp, f"g{i:03d}.wav")
        write_wav(p, stereo, 44100)
        utts.append(EvalUtterance(name=f"g{i:03d}", path=p))

    def extract(method: str):
        def reader(path):
            y, sr = read_wav(path)  # channel 0, the reference's y[:, 0]
            return resample(y, sr, 16000, method=method), 16000

        es = EvalUtteranceSet(utts, rate=16000, batch_size=8,
                              bucket_frames=50, num_workers=2, reader=reader)
        return trainer.extract_embeddings(es)

    store_k = extract("kaiser_best")
    store_p = extract("polyphase")

    names = [u.name for u in utts]
    ek = np.stack([store_k[n] for n in names])
    ep = np.stack([store_p[n] for n in names])
    emb_delta = np.abs(ek - ep).max(axis=1)

    # trial cosines over all pairs (embeddings are L2-normed by the LMCL path)
    sk = ek @ ek.T
    sp = ep @ ep.T
    iu = np.triu_indices(len(names), k=1)
    score_delta = np.abs(sk[iu] - sp[iu])

    # PCM-level difference for scale
    pcm_delta = []
    for u in utts[:8]:
        y, sr = read_wav(u.path)
        pcm_delta.append(float(np.abs(
            resample(y, sr, 16000, method="kaiser_best")
            - resample(y, sr, 16000, method="polyphase")).max()))

    report = {
        "steps_trained": args.steps,
        "loss_first_last": [first, last],
        "n_utts": len(names),
        "pcm_max_abs_delta": max(pcm_delta),
        "embedding_max_abs_delta": float(emb_delta.max()),
        "embedding_p50_abs_delta": float(np.median(emb_delta)),
        "trial_score_max_abs_delta": float(score_delta.max()),
        "trial_score_p50_abs_delta": float(np.median(score_delta)),
        "parity_bar": 1e-4,
        "polyphase_exceeds_bar": bool(emb_delta.max() > 1e-4),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
