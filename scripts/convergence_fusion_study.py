#!/usr/bin/env python
"""Epoch-scale AV-fusion convergence study: torch reference recipe vs
deeplip_tpu (VERDICT r3 #7).

Round 3 proved 10-step f64 train parity for the fusion stack from RAW
inputs (loss 2.9e-6, live-param drift 5.2e-8,
``docs/train_parity_fusion_r03.json``); this adds the epoch-scale run the
audio stack has (``docs/convergence_r03``): the frozen-encoder LowFER
recipe over many optimizer steps with per-epoch MultiStepLR decays,
ending in equivalent eval quality.

Protocol:
- ONE shared synthetic AV corpus: hard audio (shared resonances + strong
  noise, ``data/synthetic.py:make_hard_audio_corpus``) paired with hard
  lip clips (tight shared blob-parameter band + strong noise, reused from
  ``scripts/convergence_video_study.py``), 10 speakers, held-out eval
  utterance/clip pairs.
- ONE shared batch stream of RAW inputs (PCM crops + uint8 clips) so both
  frameworks run their full pipelines — torch: host MFCC + per-clip
  batch-1 video embedding loop (≙ ``/root/reference/train_fusion.py:
  241-315``); deeplip: on-device MFCC + dense masked clip-group embedding
  in ONE jitted step.
- ONE shared init (torch snapshots imported via interop/torch_import);
  encoders FROZEN in eval mode on both sides.
- The reference fusion recipe: LowFER gated-concat head (live path of
  ``LBP.py:38-51``) + CrossEntropy criterion, SGD 0.5 / momentum 0.9 /
  coupled wd 1e-5 over head+criterion only, MultiStepLR [4, 8] per epoch
  (``conf/fusion_config.yaml`` semantics).

Per epoch both sides report mean train loss and held-out classification
accuracy of the fusion head.

Run: ``PYTHONPATH= JAX_PLATFORMS=cpu python scripts/convergence_fusion_study.py``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"))

N_SPK = 10
UTTS_PER_SPK = 10  # 8 train / 2 eval
CLIPS_PER_SPK = 10  # 8 train / 2 eval
T_CLIP = 10
RAW, CROP = 48, 44
EPOCHS = 10
STEPS_PER_EPOCH = 15
BS = 8
D = 512
LR, MOMENTUM, WD = 0.5, 0.9, 1e-5
MILESTONES = [4, 8]  # epochs (reference conf/fusion_config.yaml)
N_SAMPLES = 16000  # 1 s PCM crop per item
MEAN, STD = 0.421, 0.165


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=EPOCHS)
    p.add_argument("--out", default="docs/convergence_fusion_r04")
    p.add_argument("--n-spk", type=int, default=N_SPK)
    p.add_argument("--separation", type=float, default=0.06,
                   help="audio speaker-resonance separation "
                   "(make_hard_audio_corpus; smaller = closer classes)")
    p.add_argument("--video-band", type=float, default=1.0,
                   help="scale on the per-speaker blob-parameter bands "
                   "(smaller = closer classes)")
    p.add_argument("--video-noise", type=float, default=0.35,
                   help="per-frame Gaussian noise floor in the clips")
    args = p.parse_args()
    epochs = args.epochs
    # VERDICT r4 weak #5: at the r4 defaults (10 spk, band 1.0) both sides
    # hit 100% held-out accuracy by epoch ~12 and the curve tail carries no
    # discriminative power. The r5 re-run hardens the corpus — more
    # speakers, tighter class bands, more noise — so accuracy tops out
    # below saturation and the curves stay comparable end to end:
    #   --n-spk 24 --separation 0.03 --video-band 0.4 --video-noise 0.5
    n_spk = args.n_spk

    import numpy as np
    import torch

    from benchmarks.reference_cpu_baseline import numpy_mfcc
    from convergence_video_study import make_hard_clip
    from parity_check import (build_torch_ce, build_torch_lipreading,
                              build_torch_lowfer, build_torch_net,
                              train_torch_net)
    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.data.manifest import SpeakerManifest
    from deeplip_tpu.data.synthetic import make_hard_audio_corpus

    # ---- shared corpus ---------------------------------------------------
    work = tempfile.mkdtemp(prefix="converge_fusion_")
    print(f"[corpus] {work}", file=sys.stderr)
    make_hard_audio_corpus(work, n_spk=n_spk, utts_per_spk=UTTS_PER_SPK,
                           duration=2.0, separation=args.separation)
    manifest = SpeakerManifest.load(os.path.join(work, "manifest.csv"))
    pcm_by_spk = []
    for spk in manifest.speakers:
        pcm_by_spk.append([read_wav(u.path)[0] for u in spk])

    crng = np.random.default_rng(5)
    band = args.video_band
    clips_by_spk = []
    for s in range(n_spk):
        srng = np.random.default_rng(1000 + s)
        params = (
            RAW * (0.5 + srng.uniform(-0.04 * band, 0.04 * band)),
            RAW * (0.5 + srng.uniform(-0.04 * band, 0.04 * band)),
            10.0 * (1 + srng.uniform(-0.15 * band, 0.15 * band)),
            10.0 * (1 + srng.uniform(-0.15 * band, 0.15 * band)),
        )
        clips_by_spk.append(
            [make_hard_clip(crng, params, T_CLIP, RAW, noise=args.video_noise)
             for _ in range(CLIPS_PER_SPK)])

    # ---- shared raw batch stream ------------------------------------------
    rng = np.random.default_rng(42)
    steps = epochs * STEPS_PER_EPOCH
    pcm = np.zeros((steps, BS, N_SAMPLES), np.float32)
    clips_u8 = np.zeros((steps, BS, 1, T_CLIP, RAW, RAW), np.uint8)
    labels = np.zeros((steps, BS), np.int64)
    for k in range(steps):
        for i in range(BS):
            spk = (k * BS + i) % n_spk  # idx % n_spk balance
            y = pcm_by_spk[spk][int(rng.integers(8))]  # train utts 0-7
            start = int(rng.integers(0, len(y) - N_SAMPLES + 1))
            pcm[k, i] = y[start:start + N_SAMPLES]
            clips_u8[k, i, 0] = clips_by_spk[spk][int(rng.integers(8))]
            labels[k, i] = spk
    clip_lengths = np.full((BS, 1), T_CLIP, np.int32)
    group_sizes = np.ones((BS,), np.int32)

    # held-out eval pairs: utts/clips 8-9 of each speaker
    eval_pcm, eval_clips, eval_labels = [], [], []
    for s in range(n_spk):
        for j in (8, 9):
            y = pcm_by_spk[s][j][:N_SAMPLES]
            eval_pcm.append(np.pad(y, (0, N_SAMPLES - len(y))))
            eval_clips.append(clips_by_spk[s][j][None])
            eval_labels.append(s)
    eval_pcm = np.stack(eval_pcm).astype(np.float32)
    eval_clips = np.stack(eval_clips)
    eval_labels = np.asarray(eval_labels)
    n_eval = len(eval_labels)
    eval_clip_lengths = np.full((n_eval, 1), T_CLIP, np.int32)
    eval_group_sizes = np.ones((n_eval,), np.int32)

    # ---- torch reference ----------------------------------------------------
    contexts = [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]]
    hidden = [32, 32, 64]
    torch.manual_seed(0)
    tnet_a = build_torch_net(torch, contexts, [24] + hidden, D).eval()
    tnet_v = build_torch_lipreading(torch, n_spk, hidden_dim=8,
                                    tcn_layers=2, layers=(1, 1, 1, 1)).eval()
    thead = build_torch_lowfer(torch, D, o=D, k=30, seed=1)
    thead = thead.float()
    tcrit = build_torch_ce(torch, 3 * D, n_spk)
    import copy

    # --- pretrain the encoders (the reference freezes PRETRAINED nets,
    # train_fusion.py:191-201 — with random encoders the head cannot
    # separate speakers and the lr-0.5 recipe just decays the initial
    # spike; measured before this was added). Pretraining happens in torch
    # ONLY and the resulting snapshots are the study's shared init.
    print("[pretrain] audio encoder...", file=sys.stderr)
    feats_by_utt, labels_by_utt = {}, {}
    for s in range(n_spk):
        for j in range(8):
            name = f"s{s}_u{j}"
            feats_by_utt[name] = numpy_mfcc(
                pcm_by_spk[s][j].astype(np.float64)).astype(np.float32)
            labels_by_utt[name] = s
    train_torch_net(torch, tnet_a, feats_by_utt, labels_by_utt, D, n_spk,
                    steps=60 * max(1, n_spk // N_SPK), bs=16)

    print("[pretrain] video encoder...", file=sys.stderr)
    prng = np.random.default_rng(9)
    vopt = torch.optim.Adam(tnet_v.parameters(), lr=1e-3)
    tnet_v.train()
    v_pretrain_steps = 80 * max(1, n_spk // N_SPK)
    for step in range(v_pretrain_steps):
        xs, ys = [], []
        for i in range(8):
            spk = (step * 8 + i) % n_spk
            c = clips_by_spk[spk][int(prng.integers(8))]
            off2 = (RAW - CROP) // 2
            x = (c[:, off2:off2 + CROP, off2:off2 + CROP].astype(np.float32)
                 / np.float32(255.0) - np.float32(MEAN)) / np.float32(STD)
            xs.append(x)
            ys.append(spk)
        out = tnet_v(torch.tensor(np.stack(xs))[:, None],
                     [T_CLIP] * 8)
        loss = torch.nn.functional.cross_entropy(out, torch.tensor(ys))
        vopt.zero_grad()
        loss.backward()
        vopt.step()
        if step % 20 == 0 or step == v_pretrain_steps - 1:
            print(f"  torch video pre-train step {step}: "
                  f"loss {loss.item():.4f}", file=sys.stderr)
    tnet_a.eval()
    tnet_v.eval()

    tnet_a_init = copy.deepcopy(tnet_a.state_dict())
    tnet_v_init = copy.deepcopy(tnet_v.state_dict())
    thead_init = copy.deepcopy(thead.state_dict())
    tcrit_init = copy.deepcopy(tcrit.state_dict())
    opt = torch.optim.SGD(
        [{"params": thead.parameters()}, {"params": tcrit.parameters()}],
        lr=LR, momentum=MOMENTUM, weight_decay=WD)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, MILESTONES, gamma=0.1)

    off = (RAW - CROP) // 2

    def torch_transform(clip_u8):  # center crop + normalize, f32 math
        c = clip_u8[:, off:off + CROP, off:off + CROP]
        return torch.tensor(
            (c.astype(np.float32) / np.float32(255.0) - np.float32(MEAN))
            / np.float32(STD))

    def torch_vfeats(x):  # (1, 1, T, H, W) -> (T, 512)
        h = tnet_v.frontend3D(x)
        t = h.shape[2]
        h = h.transpose(1, 2).reshape(t, h.shape[1], h.shape[3], h.shape[4])
        return tnet_v.trunk(h)

    def torch_embed(pcm_batch, clips_batch):
        with torch.no_grad():
            feats = np.stack([numpy_mfcc(pcm_batch[i].astype(np.float64))
                              .astype(np.float32)
                              for i in range(len(pcm_batch))])
            x = torch.tensor(np.transpose(feats, (0, 2, 1)))
            h = tnet_a.tdnn(x)
            stats = torch.cat([h.mean(2), h.std(2)], 1)
            xv_audio = tnet_a.fc2(tnet_a.act(tnet_a.bn1(tnet_a.fc1(stats))))
            em_video = torch.stack([
                torch_vfeats(torch_transform(clips_batch[i, 0])[None, None])
                .mean(0)
                for i in range(len(clips_batch))])
        return xv_audio, em_video

    def torch_eval():
        thead.eval(), tcrit.eval()
        with torch.no_grad():
            e1, e2 = torch_embed(eval_pcm, eval_clips)
            _, logits = tcrit(thead(e1, e2), torch.tensor(eval_labels))
            acc = float((logits.argmax(-1).numpy() == eval_labels).mean())
        thead.train(), tcrit.train()
        return acc

    torch_curve = {"loss": [], "acc": []}
    print("[torch] training...", file=sys.stderr)
    for e in range(epochs):
        ep_loss = []
        for k in range(STEPS_PER_EPOCH):
            step = e * STEPS_PER_EPOCH + k
            opt.zero_grad()
            e1, e2 = torch_embed(pcm[step], clips_u8[step])
            loss, _ = tcrit(thead(e1, e2), torch.tensor(labels[step]))
            loss.backward()
            opt.step()
            ep_loss.append(float(loss.item()))
        sched.step()  # per EPOCH (reference MultiStepLR semantics)
        torch_curve["loss"].append(float(np.mean(ep_loss)))
        torch_curve["acc"].append(torch_eval())
        print(f"[torch] epoch {e+1}: loss={torch_curve['loss'][-1]:.4f} "
              f"acc={torch_curve['acc'][-1]*100:.1f}%", file=sys.stderr)

    # ---- deeplip FusionTrainer ------------------------------------------------
    import jax
    import jax.numpy as jnp

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import replicated_sharding
    from deeplip_tpu.interop.torch_import import (
        import_lipreading_state_dict, import_speaker_embnet_state_dict)
    from deeplip_tpu.train.fusion import FusionTrainer
    from deeplip_tpu.train.state import TrainState

    audio_model_opts = {"arch": "tdnn", "tdnn": {
        "input_dim": 24, "hidden_dim": hidden, "context": contexts,
        "tdnn_layers": len(contexts), "embedding_dim": D,
        "pooling": "statistic", "attention_hidden_size": 8,
        "bn_first": True}}
    video_cfg = Config({
        "backbone_type": "resnet", "relu_type": "prelu",
        "tcn_kernel_size": [3], "tcn_num_layers": 2, "tcn_dropout": 0.0,
        "tcn_dwpw": False, "tcn_width_mult": 1, "width_mult": 1.0})
    audio_data = {"rate": 16000, "feat_type": "mfcc", "mfcc": {
        "n_fft": 512, "num_bin": 26, "num_cep": 24, "energy": True,
        "normalize": True, "delta": False,
        "win_len": 0.025, "win_shift": 0.01}}

    trainer = FusionTrainer(
        audio_model_opts, video_cfg, n_spk=n_spk,
        audio_data_opts=audio_data, lr=LR, momentum=MOMENTUM,
        weight_decay=WD, lr_decay_step=tuple(MILESTONES),
        steps_per_epoch=STEPS_PER_EPOCH, crop_size=(CROP, CROP),
        video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        loss="CrossEntropy")
    trainer.init_encoders()
    a_params, a_stats = import_speaker_embnet_state_dict(
        tnet_a_init, n_blocks=len(contexts))
    trainer.audio_vars = {"params": a_params, "batch_stats": a_stats}
    v_params, v_stats = import_lipreading_state_dict(
        tnet_v_init, layers=(1, 1, 1, 1))
    trainer.video_vars = {
        "params": {**trainer.video_vars["params"], **v_params},
        "batch_stats": {**trainer.video_vars["batch_stats"], **v_stats}}

    head_params = {"U": thead_init["U"].numpy().astype(np.float32).copy(),
                   "V": thead_init["V"].numpy().astype(np.float32).copy()}
    w = tcrit_init["fc.weight"].numpy()
    crit_params = {"fc": {"kernel": np.ascontiguousarray(w.T),
                          "bias": tcrit_init["fc.bias"].numpy().copy()}}
    params = {"fusion": head_params, "criterion": crit_params}
    state = TrainState(
        params=jax.device_put(params, replicated_sharding(trainer.mesh)),
        batch_stats={},
        opt_state=trainer.tx.init(params), step=0)

    @jax.jit
    def ours_eval_fn(params, pcm_b, clips_b, clens, gsizes, labs):
        e1 = trainer._audio_embed(pcm_b)
        e2 = trainer._video_group_embed(clips_b, clens, gsizes)
        fused = trainer._head_apply(trainer._head_vars(params), e1, e2)
        _, logits = trainer.criterion.apply(
            {"params": params["criterion"]}, fused, labs, reduction="none")
        return logits

    ours_curve = {"loss": [], "acc": []}
    print("[deeplip] training...", file=sys.stderr)
    for e in range(epochs):
        ep_loss = []
        for k in range(STEPS_PER_EPOCH):
            step = e * STEPS_PER_EPOCH + k
            state, metrics = trainer._train_step(
                state, jnp.asarray(pcm[step]), jnp.asarray(clips_u8[step]),
                jnp.asarray(clip_lengths), jnp.asarray(group_sizes),
                jnp.asarray(labels[step]))
            ep_loss.append(float(metrics["loss"]))
        logits = np.asarray(ours_eval_fn(
            state.params, jnp.asarray(eval_pcm), jnp.asarray(eval_clips),
            jnp.asarray(eval_clip_lengths), jnp.asarray(eval_group_sizes),
            jnp.asarray(eval_labels)))
        acc = float((logits.argmax(-1) == eval_labels).mean())
        ours_curve["loss"].append(float(np.mean(ep_loss)))
        ours_curve["acc"].append(acc)
        print(f"[deeplip] epoch {e+1}: loss={ours_curve['loss'][-1]:.4f} "
              f"acc={acc*100:.1f}%", file=sys.stderr)

    # ---- report ----------------------------------------------------------
    loss_gap = max(abs(a - b) for a, b in
                   zip(torch_curve["loss"], ours_curve["loss"]))
    report = {
        "recipe": {"head": "LowFER gated-concat (live path)",
                   "loss": "CrossEntropy",
                   "optimizer": f"SGD lr={LR} momentum={MOMENTUM} wd={WD} "
                                "(head+criterion only, encoders frozen)",
                   "milestones_epochs": MILESTONES, "bs": BS,
                   "epochs": epochs, "steps_per_epoch": STEPS_PER_EPOCH,
                   "data": {"n_spk": n_spk, "t_clip": T_CLIP, "crop": CROP,
                            "pcm_samples": N_SAMPLES,
                            "separation": args.separation,
                            "video_band": args.video_band,
                            "video_noise": args.video_noise}},
        "torch": torch_curve,
        "deeplip_tpu": ours_curve,
        "max_epoch_loss_gap": loss_gap,
        "final_acc_torch": torch_curve["acc"][-1],
        "final_acc_deeplip": ours_curve["acc"][-1],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as fjson:
        json.dump(report, fjson, indent=2)

    lines = [
        "# AV-fusion convergence study — torch reference recipe vs deeplip_tpu",
        "",
        "Epoch-scale companion to the 10-step f64 fusion train parity",
        "(`docs/train_parity_fusion_r03.json`, live-param drift 5.2e-8):",
        f"one shared synthetic AV corpus (hard audio + hard lip clips, {n_spk}",
        "speakers), encoders PRETRAINED in torch then snapshotted as the",
        "shared init — the reference freezes PRETRAINED nets",
        "(`train_fusion.py:191-201`); with random encoders the lr-0.5 head",
        "recipe cannot learn (measured: both frameworks identically decay a",
        "loss spike to chance accuracy). ONE shared RAW batch stream (PCM",
        "crops + uint8 clips —",
        "both sides run their full pipelines: torch per-clip batch-1 loops,",
        "deeplip one jitted dense masked step), ONE shared torch init,",
        "frozen eval-mode encoders, and the reference fusion recipe",
        "(`/root/reference/train_fusion.py:241-315`: LowFER gated concat +",
        f"CE, SGD {LR}/momentum {MOMENTUM}/wd {WD} over head+criterion",
        f"only, MultiStepLR {MILESTONES} per epoch); bs {BS}, {epochs}",
        f"epochs x {STEPS_PER_EPOCH} steps.",
        "",
        "| epoch | torch loss | deeplip loss | torch acc | deeplip acc |",
        "|---|---|---|---|---|",
    ]
    for e in range(epochs):
        lines.append(
            f"| {e+1} | {torch_curve['loss'][e]:.4f} | "
            f"{ours_curve['loss'][e]:.4f} | {torch_curve['acc'][e]*100:.1f}% "
            f"| {ours_curve['acc'][e]*100:.1f}% |")
    n_eval = 2 * n_spk  # 2 held-out items per speaker
    acc_gap_items = abs(
        round(torch_curve["acc"][-1] * n_eval)
        - round(ours_curve["acc"][-1] * n_eval))
    p_mean = (torch_curve["acc"][-1] + ours_curve["acc"][-1]) / 2
    sigma_items = float(np.sqrt(n_eval * p_mean * max(1 - p_mean, 1e-9)))
    lines += [
        "",
        f"Max per-epoch mean-loss gap: **{loss_gap:.4f}**; final held-out "
        f"accuracy torch **{torch_curve['acc'][-1]*100:.1f}%** vs deeplip "
        f"**{ours_curve['acc'][-1]*100:.1f}%** — the eval set is {n_eval} "
        f"clips (2 held-out per speaker), so the final gap is "
        f"{acc_gap_items} decision(s) ≈ "
        f"{acc_gap_items / max(sigma_items, 1e-9):.1f}σ of a {n_eval}-item "
        f"binomial at these accuracies (1σ ≈ {sigma_items:.1f} items).",
        "",
        "Interpretation: identical init + identical raw batches + identical",
        "recipe; the two sides' embedding pipelines agree to ~1e-6 per step",
        "(f64 parity) and the SGD-0.5 head amplifies f32 noise over 150",
        "steps, so curves must track epoch-by-epoch and reach equivalent",
        "eval quality; they are not expected to be bit-equal.",
    ]
    with open(args.out + ".md", "w") as fmd:
        fmd.write("\n".join(lines) + "\n")
    print(json.dumps({"max_epoch_loss_gap": loss_gap,
                      "final_acc_torch": torch_curve["acc"][-1],
                      "final_acc_deeplip": ours_curve["acc"][-1]}))


if __name__ == "__main__":
    main()
