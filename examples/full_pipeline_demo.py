#!/usr/bin/env python
"""Full-framework walkthrough on a synthetic corpus.

Exercises every production path end-to-end, no external data needed:

1. synthesize a paired audio+video corpus and a GRID-style trial list;
2. train the audio x-vector system (E-TDNN recipe, tiny dims);
3. train the video lipreading classifier; extract per-clip embeddings;
4. train the fusion head on frozen encoders (batched clip groups);
5. score every back-end: audio cosine, video cosine, score fusion,
   feature fusion, PLDA.

Run: python examples/full_pipeline_demo.py [--device cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--device", default=None, choices=[None, "cpu"],
                   help="force the CPU backend (8 virtual devices)")
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import numpy as np

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import make_mesh
    from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
    from deeplip_tpu.data.fusion_pipeline import AVTrainPipeline
    from deeplip_tpu.data.manifest import SpeakerManifest
    from deeplip_tpu.data.synthetic import (
        make_audio_corpus,
        make_trial_list,
        synth_video_clip,
    )
    from deeplip_tpu.data.video_dataset import VideoClip, VideoClipBatches
    from deeplip_tpu.eval.plda import PLDA, plda_eer
    from deeplip_tpu.eval.scoring import (
        TrialList,
        cosine_eer,
        feature_fusion_eer,
        score_fusion_eer,
    )
    from deeplip_tpu.train.audio import AudioTrainer
    from deeplip_tpu.train.fusion import FusionTrainer
    from deeplip_tpu.train.video import VideoTrainer

    work = args.workdir or tempfile.mkdtemp(prefix="deeplip_demo_")
    print(f"[demo] workdir: {work}")
    mesh = make_mesh()
    print(f"[demo] mesh: {mesh.devices.shape} {mesh.axis_names}")

    # ---- 1. synthetic paired corpus ------------------------------------
    corpus = os.path.join(work, "corpus")
    make_audio_corpus(corpus, n_spk=4, utts_per_spk=6, duration=2.5)
    manifest = SpeakerManifest.load(os.path.join(corpus, "manifest.csv"))
    trial_path = os.path.join(corpus, "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=400)
    trials = TrialList.load(trial_path)

    rng = np.random.default_rng(0)
    clips, video_map = [], {}
    for s, spk in enumerate(manifest.speakers):
        vdir = os.path.join(corpus, "videos", f"s{s:02d}")
        os.makedirs(vdir, exist_ok=True)
        for utt in spk:
            stem = os.path.splitext(os.path.basename(utt.path))[0]
            data = synth_video_clip(rng, speaker_seed=2000 + s, t=10, size=96)
            path = os.path.join(vdir, stem + ".npz")
            np.savez(path, data=data)
            clips.append(VideoClip(path, s, f"s{s:02d}/{stem}"))
            video_map[utt.path] = [path]

    # ---- 2. audio system ------------------------------------------------
    audio_cfg = Config(
        {
            "data": {
                "frames": [60, 100],
                "train_manifest": os.path.join(corpus, "manifest.csv"),
                "python_data_config": {
                    "rate": 16000,
                    "feat_type": "mfcc",
                    "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                             "energy": True, "normalize": True, "delta": False,
                             "win_len": 0.025, "win_shift": 0.01},
                },
            },
            "model": {
                "arch": "tdnn",
                "tdnn": {"input_dim": 24, "hidden_dim": [64, 64, 128],
                         "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]],
                         "tdnn_layers": 3, "embedding_dim": 32,
                         "pooling": "statistic", "attention_hidden_size": 16,
                         "bn_first": True},
            },
            "train": {"type": "sgd", "bs": 16, "lr_decay": 0.1,
                      "lr_decay_step": [100], "epoch": 3, "loss": "LMCL",
                      "scale": 30, "margin": [0.1, 0.2], "frame_buckets": 3,
                      "loader_workers": 4, "log_every": 0,
                      "sgd": {"init_lr": 0.05, "weight_decay": 1e-5,
                              "momentum": 0.9}},
            "test": {},
        }
    )
    print("[demo] training audio system ...")
    audio = AudioTrainer(audio_cfg, mesh=mesh, exp_root=os.path.join(work, "exp"),
                         log_time="audio")
    audio.train()
    audio.model_average(avg_num=2)

    utts = [EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
            for _, u in manifest.all_utterances()]
    astore = audio.extract_embeddings(
        EvalUtteranceSet(utts, batch_size=16, bucket_frames=100, num_workers=4)
    )
    eer_a, _ = cosine_eer(trials, astore)
    print(f"[demo] audio cosine EER: {eer_a * 100:.2f}%")

    # ---- 3. video system ------------------------------------------------
    video_cfg = Config({"backbone_type": "resnet", "relu_type": "prelu",
                        "tcn_dropout": 0.2, "tcn_dwpw": False,
                        "tcn_kernel_size": [3, 5, 7], "tcn_num_layers": 2,
                        "tcn_width_mult": 1, "width_mult": 1.0})
    print("[demo] training video system ...")
    video = VideoTrainer(video_cfg, num_classes=manifest.n_spk, mesh=mesh,
                         hidden_dim=24, exp_root=os.path.join(work, "exp"),
                         log_time="video")
    video.train(VideoClipBatches(clips, batch_size=16, bucket_t=5, num_workers=4),
                epochs=2)
    vstore = video.embedding_store(
        VideoClipBatches(clips, batch_size=16, bucket_t=5, shuffle=False,
                         num_workers=4),
        name_map=lambda n: n + ".wav",
    )
    eer_v, _ = cosine_eer(trials, vstore)
    print(f"[demo] video cosine EER: {eer_v * 100:.2f}%")

    # ---- 4. fusion head ---------------------------------------------------
    print("[demo] training fusion head (frozen encoders) ...")
    fusion = FusionTrainer(
        audio_cfg.model, video_cfg, n_spk=manifest.n_spk,
        audio_data_opts=audio_cfg.data.python_data_config, mesh=mesh,
        lr=0.05, steps_per_epoch=8, video_hidden_dim=24,
        exp_root=os.path.join(work, "exp"), log_time="fusion",
    )
    fusion.init_encoders()
    fusion.load_encoders(os.path.join(audio.exp_dir, "net_avg"),
                         os.path.join(video.exp_dir, "net_2"))
    fusion.train(
        AVTrainPipeline(manifest, video_map, batch_size=16, frame_range=(60, 80),
                        n_buckets=2, max_clips=1, clip_frames=10, num_workers=4),
        epochs=2,
    )
    fusion.model_average(avg_num=2)

    # ---- 5. fusion back-ends ---------------------------------------------
    eer_sf, _ = score_fusion_eer(trials, astore, vstore)
    eer_ff, _ = feature_fusion_eer(trials, astore, vstore)
    x = np.stack([astore[u] for u in astore.table])
    labels = np.asarray([int(u.split("/")[0][1:]) for u in astore.table])
    plda = PLDA().fit(x, labels, n_principal_components=16)
    eer_p, _ = plda_eer(trials, astore, plda)

    print("[demo] ---- results ----")
    print(f"[demo] audio cosine    EER: {eer_a * 100:6.2f}%")
    print(f"[demo] video cosine    EER: {eer_v * 100:6.2f}%")
    print(f"[demo] score fusion    EER: {eer_sf * 100:6.2f}%")
    print(f"[demo] feature fusion  EER: {eer_ff * 100:6.2f}%")
    print(f"[demo] audio PLDA      EER: {eer_p * 100:6.2f}%")


if __name__ == "__main__":
    main()
