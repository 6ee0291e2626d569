"""Audio system entry point.

Mirrors the reference ``train_audio.py`` __main__ flow (``:484-544``) with
the mode as a real CLI flag instead of a hard-coded constant:

- ``train``      : train → average last 4 → extract test set → cosine EER
- ``test``       : extract test set → cosine EER
- ``av_test``    : optional PLDA training; per-list extract + cos/PLDA EER
- ``av_fusion``  : score feature-fusion EER from stored embeddings

Usage::

    python -m deeplip_tpu.cli.train_audio --config conf/audio_config.yaml \
        --mode train [--exp-root exp] [--resume exp/<t>/net_avg]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from deeplip_tpu.cli.common import labels_from_speaker_prefix, utterances_from_trials
from deeplip_tpu.core.config import load_audio_config
from deeplip_tpu.data.audio_pipeline import EvalUtteranceSet, eval_set_kwargs
from deeplip_tpu.eval.plda import PLDA, plda_eer
from deeplip_tpu.eval.scoring import (
    EmbeddingStore,
    TrialList,
    cosine_eer,
    feature_fusion_eer,
    score_fusion_eer,
)
from deeplip_tpu.train.audio import AudioTrainer


def _test_set(trainer: AudioTrainer, trial_path: str, root: str) -> EvalUtteranceSet:
    # one shared test_opts mapping (bucket_frames / batch_size / int16
    # transport / adaptive n_buckets) for every extraction surface
    return EvalUtteranceSet(
        utterances_from_trials(trial_path, root),
        **eval_set_kwargs(trainer.feat_cfg, trainer.test_opts),
    )


def _extract_and_save(trainer, trial_path, root, out_dir):
    store = trainer.extract_embeddings(_test_set(trainer, trial_path, root))
    if out_dir:
        store.save_npy_tree(out_dir)
    return store


def run_mode(trainer: AudioTrainer, cfg, mode: str) -> None:
    data, test = cfg.data, cfg.get("test", {})
    if mode in ("test", "av_test") and not trainer.loaded_checkpoint:
        import sys

        print(
            f"WARNING: mode '{mode}' is evaluating RANDOMLY INITIALIZED "
            "weights (no train.resume / --resume checkpoint was loaded); "
            "the reported EER is meaningless for a real system",
            file=sys.stderr,
        )
    if mode == "train":
        trainer.train()
        trainer.model_average(avg_num=4)
    if mode in ("train", "test"):
        # shared extract+score tail (reference: train mode also evaluates,
        # train_audio.py:497-500)
        trial = data.get("trial_grid", "database/trial_grid_v1.txt")
        store = _extract_and_save(
            trainer, trial, data.get("test_root", "."), os.path.join(trainer.exp_dir, "test_xv")
        )
        eer, _ = trainer.evaluate(trial, store)
        print(f"EER: {eer * 100:.6f}%")
        return

    if mode == "av_test":
        plda_model = None
        if test.get("train_plda") and data.get("plda_dev_list"):
            dev_names = [l.strip() for l in open(data["plda_dev_list"]) if l.strip()]
            dev_set = EvalUtteranceSet(
                utterances_from_trials_list(dev_names, data.get("dev_root", ".")),
                **eval_set_kwargs(trainer.feat_cfg, trainer.test_opts),
            )
            dev_store = trainer.extract_embeddings(dev_set)
            x = np.stack([dev_store[n] for n in dev_names])
            labels = np.asarray(labels_from_speaker_prefix(dev_names))
            plda_model = PLDA().fit(x, labels, n_principal_components=20)
            plda_model.save(os.path.join(trainer.exp_dir, "plda.npz"))
        for list_name, trial_key, tag in (
            ("eval_lomgrid", "trial_lomgrid", "test_xv_lomgrid"),
            ("eval_grid", "trial_grid", "test_xv_grid"),
        ):
            if not test.get(list_name):
                continue
            trial = data[trial_key]
            store = _extract_and_save(
                trainer, trial, data.get("test_root", "."), os.path.join(trainer.exp_dir, tag)
            )
            if test.get("use_cos", True):
                eer, _ = cosine_eer(TrialList.load(trial), store)
                print(f"[{trial_key}] cosine EER: {eer * 100:.6f}%")
            if test.get("use_plda") and plda_model is not None:
                eer, _ = plda_eer(TrialList.load(trial), store, plda_model)
                print(f"[{trial_key}] PLDA EER: {eer * 100:.6f}%")
        return

    if mode == "av_fusion":
        # training-free fusion from stored audio + video embeddings:
        # feature-level (z-norm+concat, the reference's live path) or
        # score-level 0.5/0.5 via test.fusion_type
        fusion_type = test.get("fusion_type", "feature")
        for list_name, trial_key, tag in (
            ("eval_lomgrid", "trial_lomgrid", "test_xv_lomgrid"),
            ("eval_grid", "trial_grid", "test_xv_grid"),
        ):
            if not test.get(list_name):
                continue
            trial = TrialList.load(data[trial_key])
            audio_store = EmbeddingStore.load_npy_tree(
                os.path.join(trainer.exp_dir, tag), trial.unique_utts
            )
            video_store = EmbeddingStore.load_npy_tree(
                data.get("video_embedding_root", os.path.join(trainer.exp_dir, "video_em")),
                trial.unique_utts,
            )
            if fusion_type == "score":
                eer, _ = score_fusion_eer(
                    trial, audio_store, video_store,
                    audio_weight=float(test.get("audio_weight", 0.5)),
                    video_weight=float(test.get("video_weight", 0.5)),
                )
            else:
                eer, _ = feature_fusion_eer(trial, audio_store, video_store)
            print(f"[{trial_key}] {fusion_type}-fusion EER: {eer * 100:.6f}%")
        return

    raise SystemExit(f"unknown mode {mode!r}")


def utterances_from_trials_list(names, root):
    from deeplip_tpu.data.audio_pipeline import EvalUtterance

    return [EvalUtterance(n, os.path.join(root, n)) for n in names]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="conf/audio_config.yaml")
    p.add_argument("--mode", default="train",
                   choices=["train", "test", "av_test", "av_fusion"])
    p.add_argument("--exp-root", default="exp")
    p.add_argument("--resume", default=None)
    p.add_argument("--log-time", default=None)
    args = p.parse_args(argv)

    cfg = load_audio_config(args.config)
    if args.resume:
        cfg.train["resume"] = args.resume
    trainer = AudioTrainer(cfg, exp_root=args.exp_root, log_time=args.log_time)
    run_mode(trainer, cfg, args.mode)


if __name__ == "__main__":
    main()
