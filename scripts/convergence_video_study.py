#!/usr/bin/env python
"""Epoch-scale video convergence study: torch reference recipe vs
deeplip_tpu (VERDICT r3 #7).

Round 3 proved 10-step train parity for the video stack at f64 (5.5e-9
drift, ``docs/train_parity_video_r03.json``); this study provides the
epoch-scale evidence the audio stack already has (``docs/convergence_r03``):
the per-iteration cosine schedule + BN-running-stat drift over hundreds of
optimizer steps, ending in equivalent eval quality.

Protocol (mirrors scripts/convergence_study.py):
- ONE deliberately-hard synthetic lip-clip corpus: every speaker's "mouth"
  blob is drawn from a tight shared parameter band (center ±4%, width
  ±15%) under strong pixel noise, so speakers are separable but not
  trivially (a make_video_corpus-style corpus EERs to 0 in one epoch).
- ONE shared batch stream: speaker-balanced sampling, the reference train
  transforms (Normalize(0,255) → RandomCrop(44) → HorizontalFlip(0.5) →
  Normalize(0.421, 0.165), ``models/video_models/dataloaders.py:13-17``)
  applied in shared numpy so torch and deeplip see IDENTICAL frames.
- ONE shared init: the torch init imported via interop/torch_import.
- The reference video recipe in both frameworks
  (``/root/reference/train_video.py:108-169``): Adam 3e-4 / coupled wd
  1e-4, CE, CosineAnnealingLR(T_max=5) stepped per ITERATION (quirk kept).
  Dropout 0 (torch/JAX dropout RNGs cannot be shared; the r3 parity
  harness made the same choice).
- Architecture: the real Lipreading shrunk via the trainer's own knobs for
  this 1-core host (TCN width 8, one BasicBlock per trunk stage, kernel
  [3] x2 layers) — every semantic (frontend3D, time-fold, PReLU trunk,
  symm-chomp TCN, masked consensus) is the reference's.

Per epoch both sides report mean train loss, held-out classification
accuracy, and cosine EER over time-mean trunk-feature embeddings (the
fusion back-ends' video embedding, ``train_fusion.py:274-275``).

Run: ``PYTHONPATH= JAX_PLATFORMS=cpu python scripts/convergence_video_study.py``
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

N_SPK = 10
CLIPS_PER_SPK = 12  # 8 train / 4 eval
T_FRAMES = 10
RAW = 48
CROP = 44
EPOCHS = 8
STEPS_PER_EPOCH = 20
BS = 8
LR, WD, T_MAX = 3e-4, 1e-4, 5
MEAN, STD = 0.421, 0.165


def make_hard_clip(rng, srng_params, t, size, noise=0.35):
    """(T, size, size) uint8: near-identical mouth blobs across speakers.

    ``noise`` scales the per-frame Gaussian noise floor — the fusion
    study's non-saturating variant raises it so speaker identity stays
    partially ambiguous at the eval horizon."""
    import numpy as np

    cx, cy, sx, sy = srng_params
    yy, xx = np.mgrid[0:size, 0:size]
    frames = np.empty((t, size, size), np.uint8)
    phase = rng.uniform(0, 2 * np.pi)
    for i in range(t):
        wob = 1.5 * np.sin(2 * np.pi * i / t + phase)
        blob = np.exp(-(((xx - cx - wob) / sx) ** 2 + ((yy - cy + wob) / sy) ** 2))
        frames[i] = np.clip(
            (blob + noise * rng.standard_normal((size, size))) * 200,
            0, 255).astype(np.uint8)
    return frames


def make_corpus(seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    clips, labels = [], []
    for s in range(N_SPK):
        srng = np.random.default_rng(1000 + s)
        params = (
            RAW * (0.5 + srng.uniform(-0.04, 0.04)),
            RAW * (0.5 + srng.uniform(-0.04, 0.04)),
            10.0 * (1 + srng.uniform(-0.15, 0.15)),
            10.0 * (1 + srng.uniform(-0.15, 0.15)),
        )
        for _ in range(CLIPS_PER_SPK):
            clips.append(make_hard_clip(rng, params, T_FRAMES, RAW))
            labels.append(s)
    import numpy as np

    return np.stack(clips), np.asarray(labels)


def train_transform(rng, clip_u8):
    """Reference train pipeline in shared numpy (dataloaders.py:13-17),
    f32 math like ops/video.py."""
    import numpy as np

    x = clip_u8.astype(np.float32) / np.float32(255.0)
    oy = int(rng.integers(0, RAW - CROP + 1))
    ox = int(rng.integers(0, RAW - CROP + 1))
    x = x[:, oy:oy + CROP, ox:ox + CROP]
    if rng.uniform() < 0.5:
        x = x[:, :, ::-1]
    return ((x - np.float32(MEAN)) / np.float32(STD)).astype(np.float32)


def eval_transform(clip_u8):
    import numpy as np

    off = (RAW - CROP) // 2
    x = clip_u8.astype(np.float32) / np.float32(255.0)
    x = x[:, off:off + CROP, off:off + CROP]
    return ((x - np.float32(MEAN)) / np.float32(STD)).astype(np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=EPOCHS)
    p.add_argument("--out", default="docs/convergence_video_r04")
    args = p.parse_args()

    import numpy as np
    import torch

    from parity_check import build_torch_lipreading
    from deeplip_tpu.eval.eer import eer_from_scores

    epochs = args.epochs
    clips, labels = make_corpus()
    train_idx = [i for i in range(len(clips)) if i % CLIPS_PER_SPK < 8]
    eval_idx = [i for i in range(len(clips)) if i % CLIPS_PER_SPK >= 8]

    # --- shared batch stream ------------------------------------------------
    rng = np.random.default_rng(42)
    by_spk = {}
    for i in train_idx:
        by_spk.setdefault(int(labels[i]), []).append(i)
    batches = []
    for step in range(epochs * STEPS_PER_EPOCH):
        f, y = [], []
        for b in range(BS):
            spk = (step * BS + b) % N_SPK  # idx % n_spk balance
            ci = by_spk[spk][int(rng.integers(len(by_spk[spk])))]
            f.append(train_transform(rng, clips[ci]))
            y.append(spk)
        batches.append((np.stack(f), np.asarray(y, np.int64)))
    lengths = np.full((BS,), T_FRAMES, np.int32)

    eval_frames = np.stack([eval_transform(clips[i]) for i in eval_idx])
    eval_labels = labels[eval_idx]
    eval_lengths = np.full((len(eval_idx),), T_FRAMES, np.int32)
    # trial pairs over held-out clips
    trng = np.random.default_rng(7)
    pairs = trng.integers(0, len(eval_idx), (1500, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    trial_labels = (eval_labels[pairs[:, 0]] == eval_labels[pairs[:, 1]]).astype(np.int8)

    def eer_from_embs(embs):
        e = embs / np.linalg.norm(embs, axis=-1, keepdims=True).clip(1e-12)
        scores = np.sum(e[pairs[:, 0]] * e[pairs[:, 1]], -1)
        return float(eer_from_scores(trial_labels, scores)[0])

    # --- torch reference ------------------------------------------------------
    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    hidden = 8
    tnet = build_torch_lipreading(torch, N_SPK, hidden_dim=hidden,
                                  tcn_layers=2, layers=layers)
    import copy

    tnet_init_sd = copy.deepcopy(tnet.state_dict())
    opt = torch.optim.Adam(tnet.parameters(), lr=LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=T_MAX)

    def torch_vfeats(x):  # (B, 1, T, H, W) -> (B, T, 512)
        h = tnet.frontend3D(x)
        b, t = h.shape[0], h.shape[2]
        h = h.transpose(1, 2).reshape(b * t, h.shape[1], h.shape[3], h.shape[4])
        return tnet.trunk(h).reshape(b, t, -1)

    def torch_eval():
        tnet.eval()
        with torch.no_grad():
            x = torch.tensor(eval_frames)[:, None]
            logits = tnet(x, list(eval_lengths))
            acc = float((logits.argmax(-1).numpy() == eval_labels).mean())
            embs = torch_vfeats(x).mean(1).numpy()
        tnet.train()
        return acc, eer_from_embs(embs)

    torch_curve = {"loss": [], "acc": [], "eer": []}
    print("[torch] training...", file=sys.stderr)
    tnet.train()
    for e in range(epochs):
        ep_loss = []
        for k in range(STEPS_PER_EPOCH):
            f, y = batches[e * STEPS_PER_EPOCH + k]
            opt.zero_grad()
            out = tnet(torch.tensor(f)[:, None], list(lengths))
            loss = torch.nn.functional.cross_entropy(out, torch.tensor(y))
            loss.backward()
            opt.step()
            sched.step()  # per ITERATION (train_video.py:140-143 quirk)
            ep_loss.append(float(loss.item()))
        acc, eer = torch_eval()
        torch_curve["loss"].append(float(np.mean(ep_loss)))
        torch_curve["acc"].append(acc)
        torch_curve["eer"].append(eer)
        print(f"[torch] epoch {e+1}: loss={torch_curve['loss'][-1]:.4f} "
              f"acc={acc*100:.1f}% eer={eer*100:.2f}%", file=sys.stderr)

    # --- deeplip_tpu ----------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import replicated_sharding
    from deeplip_tpu.interop.torch_import import import_lipreading_state_dict
    from deeplip_tpu.train.state import TrainState
    from deeplip_tpu.train.video import VideoTrainer

    cfg = Config({
        "backbone_type": "resnet", "relu_type": "prelu",
        "tcn_kernel_size": [3], "tcn_num_layers": 2, "tcn_dropout": 0.0,
        "tcn_dwpw": False, "tcn_width_mult": 1, "width_mult": 1.0,
    })
    trainer = VideoTrainer(cfg, N_SPK, lr=LR, weight_decay=WD, t_max=T_MAX,
                           crop_size=(CROP, CROP), hidden_dim=hidden,
                           trunk_layers=layers)
    i_params, i_stats = import_lipreading_state_dict(tnet_init_sd, layers=layers)
    variables = trainer.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, CROP, CROP, 1), jnp.float32))
    params = {**variables["params"], **i_params}
    stats = {**variables["batch_stats"], **i_stats}
    state = TrainState(
        params=jax.device_put(params, replicated_sharding(trainer.mesh)),
        batch_stats=jax.device_put(stats, replicated_sharding(trainer.mesh)),
        opt_state=trainer.tx.init(params),
        step=0,
    )

    @jax.jit
    def ours_eval_fn(params, batch_stats, x, lens):
        v = {"params": params, "batch_stats": batch_stats}
        logits = trainer.model.apply(v, x, lengths=lens)
        feats = trainer.model.apply(v, x, method=trainer.model.frame_features)
        return logits, feats.mean(axis=1)

    ours_curve = {"loss": [], "acc": [], "eer": []}
    print("[deeplip] training...", file=sys.stderr)
    ex = jnp.asarray(eval_frames)[..., None]
    elens = jnp.asarray(eval_lengths)
    for e in range(epochs):
        ep_loss = []
        for k in range(STEPS_PER_EPOCH):
            f, y = batches[e * STEPS_PER_EPOCH + k]
            state, metrics = trainer._train_step_frames(
                state, jnp.asarray(f)[..., None], jnp.asarray(lengths),
                jnp.asarray(y), jax.random.PRNGKey(e * 1000 + k))
            ep_loss.append(float(metrics["loss"]))
        logits, embs = ours_eval_fn(state.params, state.batch_stats, ex, elens)
        acc = float((np.asarray(logits).argmax(-1) == eval_labels).mean())
        eer = eer_from_embs(np.asarray(embs))
        ours_curve["loss"].append(float(np.mean(ep_loss)))
        ours_curve["acc"].append(acc)
        ours_curve["eer"].append(eer)
        print(f"[deeplip] epoch {e+1}: loss={ours_curve['loss'][-1]:.4f} "
              f"acc={acc*100:.1f}% eer={eer*100:.2f}%", file=sys.stderr)

    # --- report ---------------------------------------------------------------
    loss_gap = max(abs(a - b) for a, b in
                   zip(torch_curve["loss"], ours_curve["loss"]))
    report = {
        "recipe": {"loss": "CrossEntropy", "optimizer":
                   f"Adam lr={LR} coupled_wd={WD}",
                   "schedule": f"CosineAnnealingLR(T_max={T_MAX}) per iteration",
                   "bs": BS, "epochs": epochs,
                   "steps_per_epoch": STEPS_PER_EPOCH,
                   "arch": {"trunk_layers": list(layers), "tcn_width": hidden,
                            "tcn_layers": 2, "kernel": [3], "dropout": 0.0},
                   "data": {"n_spk": N_SPK, "t_frames": T_FRAMES,
                            "crop": CROP}},
        "torch": torch_curve,
        "deeplip_tpu": ours_curve,
        "max_epoch_loss_gap": loss_gap,
        "final_acc_torch": torch_curve["acc"][-1],
        "final_acc_deeplip": ours_curve["acc"][-1],
        "final_eer_torch": torch_curve["eer"][-1],
        "final_eer_deeplip": ours_curve["eer"][-1],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as fjson:
        json.dump(report, fjson, indent=2)

    lines = [
        "# Video convergence study — torch reference recipe vs deeplip_tpu (r4)",
        "",
        "Epoch-scale companion to the 10-step f64 video train parity",
        "(`docs/train_parity_video_r03.json`, 5.5e-9): one HARD synthetic",
        "lip-clip corpus (speaker blobs in a tight shared parameter band +",
        "strong noise), ONE shared speaker-balanced batch stream with the",
        "reference train transforms applied in shared numpy, ONE shared",
        "torch init, and the reference video recipe on both sides",
        "(`/root/reference/train_video.py:108-169`: Adam 3e-4/wd 1e-4, CE,",
        f"CosineAnnealingLR(T_max={T_MAX}) stepped per iteration). Lipreading",
        f"shrunk for this 1-core host (TCN width {hidden}, trunk layers",
        f"{list(layers)}, dropout 0 — RNGs are not shareable); bs {BS},",
        f"{epochs} epochs x {STEPS_PER_EPOCH} steps.",
        "",
        "| epoch | torch loss | deeplip loss | torch acc | deeplip acc |"
        " torch EER | deeplip EER |",
        "|---|---|---|---|---|---|---|",
    ]
    for e in range(epochs):
        lines.append(
            f"| {e+1} | {torch_curve['loss'][e]:.4f} | "
            f"{ours_curve['loss'][e]:.4f} | {torch_curve['acc'][e]*100:.1f}% "
            f"| {ours_curve['acc'][e]*100:.1f}% "
            f"| {torch_curve['eer'][e]*100:.2f}% "
            f"| {ours_curve['eer'][e]*100:.2f}% |")
    lines += [
        "",
        f"Max per-epoch mean-loss gap: **{loss_gap:.4f}**; final accuracy "
        f"torch **{torch_curve['acc'][-1]*100:.1f}%** vs deeplip "
        f"**{ours_curve['acc'][-1]*100:.1f}%**; final EER torch "
        f"**{torch_curve['eer'][-1]*100:.2f}%** vs deeplip "
        f"**{ours_curve['eer'][-1]*100:.2f}%**.",
        "",
        "Interpretation: identical init + identical batches + identical",
        "recipe. BN batch statistics and Adam's rsqrt accumulate f32 noise",
        "over hundreds of steps (per-step semantics agree to 5.5e-9 at f64),",
        "so the curves must track epoch-by-epoch and reach equivalent eval",
        "quality; they are not expected to be bit-equal.",
    ]
    with open(args.out + ".md", "w") as fmd:
        fmd.write("\n".join(lines) + "\n")
    print(json.dumps({"max_epoch_loss_gap": loss_gap,
                      "final_acc_torch": torch_curve["acc"][-1],
                      "final_acc_deeplip": ours_curve["acc"][-1],
                      "final_eer_torch": torch_curve["eer"][-1],
                      "final_eer_deeplip": ours_curve["eer"][-1]}))


if __name__ == "__main__":
    main()
