#!/usr/bin/env python
"""Synthetic convergence study: torch reference recipe vs deeplip_tpu
(VERDICT r2 next #5).

Both implementations train a TDNN x-vector system with the reference audio
recipe (/root/reference/train_audio.py:158-214 + conf/audio_config.yaml:
121-144 semantics — LMCL s=30 m=0.2, SGD momentum 0.9 / weight-decay 1e-5,
MultiStepLR x0.1, speaker-balanced random crop-and-concat batches) on ONE
shared deliberately-hard synthetic corpus
(``data.synthetic.make_hard_audio_corpus``: shared resonances, small
per-speaker perturbation, strong noise — EER lands in a meaningful band,
unlike the demo corpus's 0.00%). The batch stream (crop-and-concat PCM →
python_speech_features-equivalent f64 MFCC+CMVN) is generated once and fed
to BOTH trainers, so the comparison isolates training dynamics rather than
data-order luck. Model width is scaled to this 1-core host (documented in
the report); every recipe semantic is the reference's.

Outputs per-epoch train loss + eval EER curves for both and a stated
agreement bound → ``docs/convergence_r03.{json,md}``.

Run: ``PYTHONPATH= JAX_PLATFORMS=cpu python scripts/convergence_study.py``
(or on the TPU by omitting the env overrides; the deeplip side then trains
on the chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"))

ARCH = {  # reference 'tdnn' contexts, width scaled for the 1-core host
    "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [-3, 0, 3], [0], [0]],
    "hidden_dim": [64, 64, 64, 64, 192],
    "embedding_dim": 64,
}
EPOCHS = 10
STEPS_PER_EPOCH = 30
BS = 32
LR, MOMENTUM, WD = 0.01, 0.9, 1e-5
MILESTONES = [6, 9]  # epochs (reference [15, 25] scaled to the 10-epoch run)
SCALE, MARGIN = 30.0, 0.2
FRAME_RANGE = (200, 400)


def make_batches(manifest, rng, numpy_mfcc, read_wav, steps):
    """Speaker-balanced crop-and-concat batches, reference collate semantics
    (/root/reference/models/audio_models/datasets.py:112-136): one random
    frame count per batch; each item concatenates random crops of random
    utterances of one balanced-sampled speaker; features extracted on the
    concatenation, per-utterance CMVN."""
    import numpy as np

    pcm_cache = {}
    for s, u in manifest.all_utterances():
        pcm_cache.setdefault(s, []).append(read_wav(u.path)[0])
    n_spk = len(pcm_cache)
    # bucketed per-batch frame counts (11-value grid): torch is shape-
    # agnostic, but the deeplip side jit-compiles per shape — uniform ints
    # over [200,400] mean up to 201 XLA CPU compilations, which OOMs this
    # 1-core host (and the real sampler buckets crop lengths anyway,
    # PARITY.md "bucket grid" deviation). Both sides see IDENTICAL batches,
    # so bucketing cannot bias the comparison.
    frame_grid = np.linspace(FRAME_RANGE[0], FRAME_RANGE[1], 11).round()
    frame_grid = frame_grid.astype(int)
    batches = []
    for step in range(steps):
        n_frames = int(frame_grid[rng.integers(len(frame_grid))])
        need = (n_frames - 1) * 160 + 400
        feats, labels = [], []
        for i in range(BS):
            spk = int((step * BS + i) % n_spk)  # idx % n_spk balance
            chunks = []
            total = 0
            while total < need:
                y = pcm_cache[spk][int(rng.integers(len(pcm_cache[spk])))]
                crop_len = int(rng.integers(8000, min(len(y), 32000) + 1))
                start = int(rng.integers(0, len(y) - crop_len + 1))
                chunks.append(y[start:start + crop_len])
                total += crop_len
            sig = np.concatenate(chunks)[:need].astype(np.float64)
            feats.append(numpy_mfcc(sig).astype(np.float32))
            labels.append(spk)
        batches.append((np.stack(feats), np.asarray(labels, np.int64)))
    return batches


def eer_of(store, trials, cosine_eer):
    eer, _ = cosine_eer(trials, store)
    return float(eer)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--device", default=None, choices=[None, "cpu"])
    p.add_argument("--epochs", type=int, default=EPOCHS)
    p.add_argument("--out", default="docs/convergence_r03")
    args = p.parse_args()
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import numpy as np
    import torch

    from benchmarks.reference_cpu_baseline import numpy_mfcc
    from parity_check import build_torch_lmcl, build_torch_net
    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.data.manifest import SpeakerManifest
    from deeplip_tpu.data.synthetic import make_hard_audio_corpus, make_trial_list
    from deeplip_tpu.eval.scoring import EmbeddingStore, TrialList, cosine_eer

    import tempfile

    work = tempfile.mkdtemp(prefix="converge_")
    print(f"[corpus] {work}", file=sys.stderr)
    n_spk = 12
    make_hard_audio_corpus(work, n_spk=n_spk, utts_per_spk=12, duration=2.5)
    manifest = SpeakerManifest.load(os.path.join(work, "manifest.csv"))
    # held-out eval: the last 4 utterances of each speaker
    train_speakers = [spk[:8] for spk in manifest.speakers]
    test_utts = [(s, u) for s, spk in enumerate(manifest.speakers)
                 for u in spk[8:]]
    train_manifest = SpeakerManifest(train_speakers)
    trial_path = os.path.join(work, "trials.txt")
    test_manifest = SpeakerManifest(
        [[u for s2, u in test_utts if s2 == s] for s in range(n_spk)])
    make_trial_list(trial_path, test_manifest, n_trials=2000, balance=0.3)
    trials = TrialList.load(trial_path)

    rng = np.random.default_rng(42)
    epochs = args.epochs
    print("[batches] generating shared batch stream...", file=sys.stderr)
    all_batches = make_batches(train_manifest, rng, numpy_mfcc, read_wav,
                               epochs * STEPS_PER_EPOCH)

    # eval features once (shared by torch; deeplip uses its device pipeline)
    eval_feats = {}
    for s, u in test_utts:
        name = "/".join(u.path.split(os.sep)[-2:])
        y, _ = read_wav(u.path)
        eval_feats[name] = numpy_mfcc(y.astype(np.float64)).astype(np.float32)

    # ---- torch reference ------------------------------------------------
    torch.manual_seed(0)
    dims = [24] + ARCH["hidden_dim"]
    tnet = build_torch_net(torch, ARCH["context"], dims, ARCH["embedding_dim"])
    tcrit = build_torch_lmcl(torch, ARCH["embedding_dim"], n_spk, SCALE)
    tcrit.margin = MARGIN
    # snapshot the INIT so deeplip starts from the identical weights
    # (imported below via interop/torch_import) — any trajectory divergence
    # is then purely arithmetic (f32 noise under LMCL's chaotic scale-30
    # softmax), not init luck
    import copy

    init_net_sd = copy.deepcopy(tnet.state_dict())
    init_crit_sd = copy.deepcopy(tcrit.state_dict())
    opt = torch.optim.SGD(
        [{"params": tnet.parameters()}, {"params": tcrit.parameters()}],
        lr=LR, momentum=MOMENTUM, weight_decay=WD)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, MILESTONES, gamma=0.1)

    def torch_eer():
        tnet.eval()
        store = EmbeddingStore()
        with torch.no_grad():
            for name, f in eval_feats.items():
                store[name] = tnet.extract(
                    torch.tensor(f.T[None])).numpy()[0]
        tnet.train()
        return eer_of(store, trials, cosine_eer)

    torch_curve = {"loss": [], "eer": []}
    print("[torch] training...", file=sys.stderr)
    tnet.train()
    for e in range(epochs):
        ep_loss = []
        for k in range(STEPS_PER_EPOCH):
            f, y = all_batches[e * STEPS_PER_EPOCH + k]
            opt.zero_grad()
            out = tnet(torch.tensor(np.transpose(f, (0, 2, 1))))
            loss, _ = tcrit(out, torch.tensor(y))
            loss.backward()
            opt.step()
            ep_loss.append(float(loss.item()))
        sched.step()
        torch_curve["loss"].append(float(np.mean(ep_loss)))
        torch_curve["eer"].append(torch_eer())
        print(f"[torch] epoch {e+1}: loss={torch_curve['loss'][-1]:.4f} "
              f"eer={torch_curve['eer'][-1]*100:.2f}%", file=sys.stderr)

    # ---- deeplip_tpu -----------------------------------------------------
    import jax
    import jax.numpy as jnp

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
    from deeplip_tpu.train.audio import AudioTrainer
    from deeplip_tpu.train.schedules import multistep_schedule
    from deeplip_tpu.train.state import build_optimizer

    cfg = Config({
        "data": {"frames": list(FRAME_RANGE), "python_data_config": {
            "rate": 16000, "feat_type": "mfcc",
            "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                     "energy": True, "normalize": True, "delta": False,
                     "win_len": 0.025, "win_shift": 0.01}}},
        "model": {"arch": "tdnn", "tdnn": {
            "input_dim": 24, "hidden_dim": ARCH["hidden_dim"],
            "context": ARCH["context"],
            "tdnn_layers": len(ARCH["context"]),
            "embedding_dim": ARCH["embedding_dim"], "pooling": "statistic",
            "attention_hidden_size": 16, "bn_first": True}},
        "train": {"loss": "LMCL", "scale": SCALE, "margin": [MARGIN, MARGIN],
                  "type": "sgd", "bs": BS, "lr_decay": 0.1,
                  "lr_decay_step": MILESTONES, "epoch": epochs,
                  "sgd": {"init_lr": LR, "weight_decay": WD,
                          "momentum": MOMENTUM}},
        "test": {"bucket_frames": 50, "batch_size": 16},
    })
    trainer = AudioTrainer(cfg, n_spk=n_spk)
    # the epoch-milestone LR schedule needs the real steps/epoch (no
    # manifest-driven pipeline in this harness)
    trainer.schedule = multistep_schedule(LR, MILESTONES, 0.1, STEPS_PER_EPOCH)
    trainer.tx = build_optimizer("sgd", trainer.schedule, momentum=MOMENTUM,
                                 weight_decay=WD)
    # identical init: import the torch snapshot (same path the .pth weight
    # bridge uses, interop/torch_import.py)
    from deeplip_tpu.core.mesh import replicated_sharding
    from deeplip_tpu.interop.torch_import import (
        import_lmcl_state_dict, import_speaker_embnet_state_dict)
    from deeplip_tpu.train.state import TrainState

    i_params, i_stats = import_speaker_embnet_state_dict(
        init_net_sd, n_blocks=len(ARCH["context"]))
    new_params = {"model": i_params,
                  "criterion": import_lmcl_state_dict(init_crit_sd)}
    state = TrainState(
        params=jax.device_put(new_params, replicated_sharding(trainer.mesh)),
        batch_stats=jax.device_put({"model": i_stats},
                                   replicated_sharding(trainer.mesh)),
        opt_state=trainer.tx.init(new_params),
        step=0,
    )

    eval_set = EvalUtteranceSet(
        [EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
         for _, u in test_utts],
        batch_size=16, bucket_frames=50, num_workers=2)

    ours_curve = {"loss": [], "eer": []}
    print("[deeplip] training...", file=sys.stderr)
    for e in range(epochs):
        ep_loss = []
        for k in range(STEPS_PER_EPOCH):
            f, y = all_batches[e * STEPS_PER_EPOCH + k]
            state, metrics = trainer._train_step_feats(
                state, jnp.asarray(f), jnp.asarray(y), jnp.float32(MARGIN))
            ep_loss.append(float(metrics["loss"]))
        trainer.state = state
        store = trainer.extract_embeddings(eval_set)
        ours_curve["loss"].append(float(np.mean(ep_loss)))
        ours_curve["eer"].append(eer_of(store, trials, cosine_eer))
        print(f"[deeplip] epoch {e+1}: loss={ours_curve['loss'][-1]:.4f} "
              f"eer={ours_curve['eer'][-1]*100:.2f}%", file=sys.stderr)

    # ---- report ----------------------------------------------------------
    loss_gap = max(abs(a - b) for a, b in
                   zip(torch_curve["loss"], ours_curve["loss"]))
    final_eer_gap = abs(torch_curve["eer"][-1] - ours_curve["eer"][-1])
    report = {
        "recipe": {"loss": "LMCL", "scale": SCALE, "margin": MARGIN,
                   "optimizer": f"SGD lr={LR} momentum={MOMENTUM} wd={WD}",
                   "milestones_epochs": MILESTONES, "bs": BS,
                   "epochs": epochs, "steps_per_epoch": STEPS_PER_EPOCH,
                   "arch": ARCH},
        "torch": torch_curve,
        "deeplip_tpu": ours_curve,
        "max_epoch_loss_gap": loss_gap,
        "final_eer_torch": torch_curve["eer"][-1],
        "final_eer_deeplip": ours_curve["eer"][-1],
        "final_eer_abs_gap": final_eer_gap,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as fjson:
        json.dump(report, fjson, indent=2)

    lines = [
        "# Convergence study — torch reference recipe vs deeplip_tpu (r3)",
        "",
        "One shared HARD synthetic corpus (12 speakers sharing one resonance",
        "stack, ±6% per-speaker perturbation, strong noise —",
        "`data/synthetic.py:make_hard_audio_corpus`), one shared",
        "speaker-balanced crop-and-concat batch stream (reference collate",
        "semantics, python_speech_features-equivalent f64 MFCC+CMVN), ONE",
        "shared init (the torch init imported via `interop/torch_import`),",
        "the reference LMCL/SGD/MultiStepLR recipe in both frameworks.",
        f"TDNN widths scaled to this 1-core host: {ARCH['hidden_dim']},",
        f"embedding {ARCH['embedding_dim']}; bs {BS}; {epochs} epochs x "
        f"{STEPS_PER_EPOCH} steps; LR 0.01 x0.1 at epochs {MILESTONES}.",
        "",
        "| epoch | torch loss | deeplip loss | torch EER | deeplip EER |",
        "|---|---|---|---|---|",
    ]
    for e in range(epochs):
        lines.append(
            f"| {e+1} | {torch_curve['loss'][e]:.4f} | "
            f"{ours_curve['loss'][e]:.4f} | {torch_curve['eer'][e]*100:.2f}% "
            f"| {ours_curve['eer'][e]*100:.2f}% |")
    lines += [
        "",
        f"Max per-epoch mean-loss gap: **{loss_gap:.4f}**; final EER "
        f"torch **{torch_curve['eer'][-1]*100:.2f}%** vs deeplip "
        f"**{ours_curve['eer'][-1]*100:.2f}%** (abs gap "
        f"{final_eer_gap*100:.2f} pp).",
        "",
        "Interpretation: identical init + identical batches + identical",
        "recipe; residual",
        "divergence is f32 noise amplified by LMCL's scale-30 softmax",
        "(chaotic sensitivity quantified in docs/train_parity_r03.json —",
        "per-step semantics agree to 2.8e-12 at f64). The curves must track",
        "each other epoch-by-epoch and reach equivalent EER; they are not",
        "expected to be bit-equal.",
    ]
    with open(args.out + ".md", "w") as fmd:
        fmd.write("\n".join(lines) + "\n")
    print(json.dumps({"max_epoch_loss_gap": loss_gap,
                      "final_eer_torch": torch_curve["eer"][-1],
                      "final_eer_deeplip": ours_curve["eer"][-1]}))


if __name__ == "__main__":
    main()
