"""Audio-visual fusion entry point.

Mirrors the reference ``train_fusion.py`` __main__ flow (``:423-470``) with
a real ``--mode`` flag:

- ``train``     : load frozen encoders, train the fusion head, average last
  2, then (reference ``:426-431``) extract + feature-fusion cosine EER over
  the configured lists
- ``test`` / ``av_test`` : paired extraction over the configured trial
  lists (z-norm audio ++ z-norm video concat, the live reference path) →
  cosine EER; ``av_test`` additionally fits/uses PLDA when
  ``test.train_plda``/``test.use_plda`` are set (reference ``:433-450``)
- ``av_fusion`` : score-level late fusion — separate audio/video cosines
  summed 0.5/0.5 (reference ``:452-470`` →
  ``utils.eer_cos_*_scorefusion``), plus the same optional PLDA branch

Usage::

    python -m deeplip_tpu.cli.train_fusion --config conf/fusion_config.yaml \
        --mode train
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from deeplip_tpu.core.config import load_fusion_config
from deeplip_tpu.data.fusion_pipeline import AVTrainPipeline
from deeplip_tpu.data.manifest import SpeakerManifest
from deeplip_tpu.eval.scoring import EmbeddingStore, TrialList, cosine_eer
from deeplip_tpu.train.fusion import FusionTrainer, embed_av_items


def _znorm_np(x: np.ndarray) -> np.ndarray:
    """Host-side mirror of ``train/fusion.py:_znorm`` (per-vector z-norm,
    reference ``train_fusion.py:233-238``; population std, f32)."""
    x = np.asarray(x, np.float32)
    return (x - x.mean()) / x.std()


def build_video_map(manifest: SpeakerManifest, video_root: str) -> dict:
    """utterance wav path -> matching clip npz group (glob by utterance stem
    under the speaker's video dir, ≙ fusion datasets.py:143-150)."""
    video_map = {}
    for spk in manifest.speakers:
        for utt in spk:
            stem = os.path.splitext(os.path.basename(utt.path))[0]
            spk_dir = os.path.basename(os.path.dirname(utt.path))
            pattern = os.path.join(video_root, spk_dir, stem + "*.npz")
            matches = sorted(glob.glob(pattern))
            if matches:
                video_map[utt.path] = matches
    return video_map


def make_trainer(cfg, exp_root: str, log_time: str | None,
                 mode: str = "train") -> FusionTrainer:
    model_opts = cfg.model
    train_opts = cfg.train
    video_tcn = dict(model_opts.video_config.tcn)
    video_cfg = {
        "backbone_type": video_tcn.get("backbone_type", "resnet"),
        "relu_type": video_tcn.get("relu_type", "prelu"),
        "tcn_kernel_size": video_tcn.get("tcn_kernel_size", [3, 5, 7]),
        "tcn_num_layers": video_tcn.get("tcn_num_layers", 4),
        "tcn_dropout": video_tcn.get("tcn_dropout", 0.2),
        "tcn_dwpw": video_tcn.get("tcn_dwpw", False),
        "tcn_width_mult": video_tcn.get("tcn_width_mult", 1),
        "width_mult": video_tcn.get("width_mult", 1.0),
    }
    manifest = None
    n_spk = int(train_opts.get("n_spk", 0))
    if cfg.data.get("train_manifest") and os.path.exists(cfg.data["train_manifest"]):
        manifest = SpeakerManifest.load(cfg.data["train_manifest"])
        n_spk = manifest.n_spk
    sgd = train_opts.get("sgd", {})
    # MultiStep milestones [4, 8] are EPOCH indices (reference
    # train_fusion.py:130); the schedule counts optimizer steps, so it
    # needs the per-epoch step count to convert
    bs = int(train_opts.get("bs", 60))
    steps_per_epoch = 1
    if manifest is not None:
        frames = cfg.data.get("frames", (200, 400))
        wl, ws = (cfg.data.get("python_data_config", {}).get("mfcc", {})
                  .get("win_len", 0.025),
                  cfg.data.get("python_data_config", {}).get("mfcc", {})
                  .get("win_shift", 0.01))
        epoch_len = manifest.epoch_length(float(np.mean(frames)), wl, ws)
        steps_per_epoch = max(epoch_len // bs, 1)
    trainer = FusionTrainer(
        model_opts.audio_config,
        video_cfg,
        n_spk=n_spk,
        audio_data_opts=cfg.data.get("python_data_config", {}),
        lr=float(sgd.get("init_lr", 0.5)),
        weight_decay=float(sgd.get("weight_decay", 1e-5)),
        momentum=float(sgd.get("momentum", 0.9)),
        lr_decay_step=train_opts.get("lr_decay_step", [4, 8]),
        lr_decay=float(train_opts.get("lr_decay", 0.1)),
        steps_per_epoch=steps_per_epoch,
        exp_root=exp_root,
        log_time=log_time,
        compute_dtype=str(train_opts.get("compute_dtype", "float32")),
    )
    trainer._manifest = manifest
    def _resolve(resume, which):
        if resume in (None, "", "None", "null", "~"):
            return None
        if not os.path.exists(str(resume)):
            # a mistyped path must fail loudly: frozen random encoders (or
            # a fresh head) would produce plausible but meaningless EERs
            raise FileNotFoundError(
                f"{which} checkpoint not found: {resume}")
        return str(resume)

    audio_resume = _resolve(train_opts.get("audio_config", {}).get("resume"),
                            "audio encoder")
    video_resume = _resolve(train_opts.get("video_config", {}).get("resume"),
                            "video encoder")
    trainer.init_encoders()
    # reference encoder checkpoints are torch ``.pth`` files
    # (train_fusion.py:191-196); ours are orbax dirs — dispatch by suffix
    # so a migrating user can point ``resume`` straight at the reference's
    # pretrained_models/*.pth
    def _is_pth(p):
        return p is not None and p.endswith(".pth")

    if _is_pth(audio_resume) or _is_pth(video_resume):
        trainer.load_torch_encoders(
            audio_resume if _is_pth(audio_resume) else None,
            video_resume if _is_pth(video_resume) else None)
    trainer.load_encoders(
        None if _is_pth(audio_resume) else audio_resume,
        None if _is_pth(video_resume) else video_resume)
    # trained-fusion-head resume (reference ``resume_fusion``,
    # train_fusion.py:127-129,203-208 — loaded there only in av_fusion
    # mode; we honor it for every eval mode since our test path can
    # actually use the head via test.use_fusion_head)
    if mode != "train":
        fusion_resume = _resolve(train_opts.get("resume"), "fusion head")
        if fusion_resume is not None:
            if _is_pth(fusion_resume):
                trainer.load_torch_fusion_head(fusion_resume)
            else:
                trainer.load_head_checkpoint(fusion_resume)
    return trainer


def extract_pairs(
    trainer: FusionTrainer, cfg, names, return_parts: bool = False
):
    """Paired per-utterance extraction over a list of utterance names
    (usually a trial list's unique utts, or a PLDA dev list).

    Resolves each name to its wav under ``data.test_root`` and its clip
    group under ``data.video_root`` (TCD-TIMIT ``<spk>/<stem>*.npz`` glob,
    reference ``models/fusion_models/datasets.py:143-150``), then delegates
    the buffering + device batching to
    :func:`deeplip_tpu.train.fusion.embed_av_items`.

    Returns one fused :class:`EmbeddingStore`, or with ``return_parts`` the
    ``(audio_store, video_store)`` pair for the score-fusion back-end."""
    data = cfg.data
    video_root = data.get("video_root", ".")
    test_root = data.get("test_root", ".")
    max_clips = int(cfg.train.get("max_clips", 2))

    def clip_glob(name):
        stem = os.path.splitext(os.path.basename(name))[0]
        spk_dir = os.path.dirname(name)
        return sorted(
            glob.glob(os.path.join(video_root, spk_dir, stem + "*.npz"))
        )[:max_clips]

    items = [(name, os.path.join(test_root, name), clip_glob(name))
             for name in names]
    return embed_av_items(
        trainer, items,
        max_clips=max_clips,
        clip_frames=int(cfg.train.get("clip_frames", 32)),
        use_fusion_head=bool(cfg.get("test", {}).get("use_fusion_head", False)),
        return_parts=return_parts,
    )


def _fit_plda(trainer: FusionTrainer, cfg):
    """Fit PLDA on fused dev embeddings (reference fusion av_test's
    ``trainer.train_plda()`` branch, ``train_fusion.py:434-436``)."""
    from deeplip_tpu.cli.common import labels_from_speaker_prefix
    from deeplip_tpu.eval.plda import PLDA

    data, test = cfg.data, cfg.get("test", {})
    if not (test.get("train_plda") and data.get("plda_dev_list")):
        return None
    dev_names = [l.strip() for l in open(data["plda_dev_list"]) if l.strip()]
    dev_cfg = cfg
    if data.get("dev_root"):
        # dev utterances live under dev_root, not test_root
        import copy

        dev_cfg = copy.deepcopy(cfg)
        dev_cfg.data["test_root"] = data["dev_root"]
    dev_store = extract_pairs(trainer, dev_cfg, dev_names)
    x = np.stack([dev_store[n] for n in dev_names])
    labels = np.asarray(labels_from_speaker_prefix(dev_names))
    model = PLDA().fit(
        x, labels,
        n_principal_components=int(test.get("plda_components", 20)))
    model.save(os.path.join(trainer.exp_dir, "plda.npz"))
    return model


def run_eval_lists(trainer: FusionTrainer, cfg, mode: str) -> None:
    """Shared eval dispatch for test / av_test / av_fusion (reference
    ``train_fusion.py:433-470``)."""
    from deeplip_tpu.eval.plda import plda_eer
    from deeplip_tpu.eval.scoring import score_fusion_eer

    test = cfg.get("test", {})
    plda_model = _fit_plda(trainer, cfg) if mode in ("av_test", "av_fusion") else None
    for key, trial_key in (("eval_lomgrid", "trial_lomgrid"), ("eval_grid", "trial_grid")):
        if not test.get(key):
            continue
        trial_path = cfg.data[trial_key]
        trials = TrialList.load(trial_path)
        if mode == "av_fusion":
            # score-level fusion: separate audio/video cosines, 0.5/0.5
            # (reference utils.eer_cos_*_scorefusion, utils.py:331-382)
            audio_store, video_store = extract_pairs(
                trainer, cfg, trials.unique_utts, return_parts=True)
            audio_store.save_npy_tree(
                os.path.join(trainer.exp_dir, f"test_xv_{trial_key}"))
            video_store.save_npy_tree(
                os.path.join(trainer.exp_dir, f"test_em_video_{trial_key}"))
            if test.get("use_cos", True):
                eer, _ = score_fusion_eer(
                    trials, audio_store, video_store,
                    audio_weight=float(test.get("audio_weight", 0.5)),
                    video_weight=float(test.get("video_weight", 0.5)))
                print(f"[{trial_key}] score-fusion EER: {eer * 100:.6f}%")
            if test.get("use_plda") and plda_model is not None:
                if cfg.get("test", {}).get("use_fusion_head", False):
                    # the head's fused embedding isn't derivable from the
                    # raw parts — one more device pass
                    fused = extract_pairs(trainer, cfg, trials.unique_utts)
                else:
                    # default z-norm+concat fusion (train/fusion.py:460) is
                    # exactly derivable from the parts already extracted —
                    # skip the second full DSP+encoder sweep
                    fused = EmbeddingStore()
                    for n in trials.unique_utts:
                        fused[n] = np.concatenate(
                            [_znorm_np(audio_store[n]),
                             _znorm_np(video_store[n])])
                eer, _ = plda_eer(trials, fused, plda_model)
                print(f"[{trial_key}] PLDA EER: {eer * 100:.6f}%")
            continue
        store = extract_pairs(trainer, cfg, trials.unique_utts)
        store.save_npy_tree(os.path.join(trainer.exp_dir, f"test_em_{trial_key}"))
        if test.get("use_cos", True):
            eer, _ = cosine_eer(trials, store)
            print(f"[{trial_key}] fusion EER: {eer * 100:.6f}%")
        if mode == "av_test" and test.get("use_plda") and plda_model is not None:
            eer, _ = plda_eer(trials, store, plda_model)
            print(f"[{trial_key}] PLDA EER: {eer * 100:.6f}%")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="conf/fusion_config.yaml")
    p.add_argument("--mode", default="train",
                   choices=["train", "test", "av_test", "av_fusion"])
    p.add_argument("--exp-root", default="exp")
    p.add_argument("--log-time", default=None)
    args = p.parse_args(argv)

    cfg = load_fusion_config(args.config)
    trainer = make_trainer(cfg, args.exp_root, args.log_time, mode=args.mode)

    if args.mode == "train":
        manifest = trainer._manifest
        if manifest is None:
            raise SystemExit("train mode needs data.train_manifest")
        video_map = build_video_map(manifest, cfg.data.get("video_root", "."))
        pipeline = AVTrainPipeline(
            manifest,
            video_map,
            batch_size=int(cfg.train.get("bs", 60)),
            frame_range=tuple(cfg.data.get("frames", (200, 400))),
            max_clips=int(cfg.train.get("max_clips", 2)),
            clip_frames=int(cfg.train.get("clip_frames", 32)),
        )
        trainer.train(pipeline, epochs=int(cfg.train.get("epoch", 15)))
        trainer.model_average(avg_num=2)
        # reference train mode evaluates after training (:426-431)
        run_eval_lists(trainer, cfg, "test")
        return

    run_eval_lists(trainer, cfg, args.mode)


if __name__ == "__main__":
    main()
