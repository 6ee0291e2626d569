"""Audio-visual verification service: paired (speech, lip-ROI clips) inputs.

The AV analogue of :class:`deeplip_tpu.serve.verifier.SpeakerVerifier`,
over the fusion stack's paired extraction — the reference's live AV test
path: z-norm(audio x-vector) ++ z-norm(clip-group-mean video embedding)
concat (``/root/reference/train_fusion.py:352-358``), or the trained
LowFER head output with ``use_fusion_head``. Enrollment/verify items are
``(wav, clips)`` pairs: a wav path or float32 PCM, plus a sequence of
mouth-ROI clips (``.npz``/``.npy`` paths or ``(T, H, W)`` uint8 arrays).

Clips batch through :func:`deeplip_tpu.train.fusion.embed_av_items` — one
device call per chunk (the reference pays a host round-trip per clip,
``train_fusion.py:267-281``).
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from deeplip_tpu.core.config import Config, load_fusion_config
from deeplip_tpu.eval.scoring import EmbeddingStore, TrialList
from deeplip_tpu.serve.verifier import ProfileVerifier
from deeplip_tpu.train.fusion import embed_av_items


class AVSpeakerVerifier(ProfileVerifier):
    """Enroll/verify/identify from paired audio + lip-video utterances.

    Args:
        config: fusion config path or loaded :class:`Config` — the same
            file the fusion CLI uses; encoder/head checkpoints load from
            its ``train.{audio_config,video_config}.resume`` /
            ``train.resume`` keys (orbax dirs or reference ``.pth``, by
            suffix).
        threshold: accept threshold; usually from :meth:`calibrate`.
        use_fusion_head: score with the trained LowFER head output instead
            of the z-norm concat (default: ``test.use_fusion_head``).
    """

    def __init__(self, config: str | Config, threshold: float | None = None,
                 exp_root: str = "exp", log_time: str | None = None,
                 use_fusion_head: bool | None = None):
        super().__init__(threshold)
        cfg = load_fusion_config(config) if isinstance(config, str) else config
        # reuse the CLI's trainer wiring (encoder + eval-mode head resume
        # dispatch) — serving is an eval mode
        from deeplip_tpu.cli.train_fusion import make_trainer

        self.cfg = cfg
        self.trainer = make_trainer(cfg, exp_root, log_time, mode="av_test")
        self.use_fusion_head = (
            bool(cfg.get("test", {}).get("use_fusion_head", False))
            if use_fusion_head is None else bool(use_fusion_head))
        self.max_clips = int(cfg.train.get("max_clips", 2))
        self.clip_frames = int(cfg.train.get("clip_frames", 32))

    # -- embedding -------------------------------------------------------
    def embed_items(self, named_items: Mapping[str, tuple]) -> EmbeddingStore:
        """Batched fused embeddings for ``{name: (wav, clips)}``."""
        items = [(n, wav, clips) for n, (wav, clips) in named_items.items()]
        return embed_av_items(
            self.trainer, items, max_clips=self.max_clips,
            clip_frames=self.clip_frames,
            use_fusion_head=self.use_fusion_head)

    def _is_single_item(self, x) -> bool:
        return isinstance(x, tuple) and len(x) == 2

    def _embed_one(self, item) -> np.ndarray:
        return self.embed_items({"_": item})["_"]

    # -- calibration -----------------------------------------------------
    def calibrate(self, trial_path: str) -> tuple[float, float]:
        """Score a trial list with the config's ``data.test_root`` wavs +
        ``data.video_root`` clip groups (the fusion CLI's extraction
        naming) and adopt the EER threshold. Returns ``(eer, threshold)``."""
        from deeplip_tpu.cli.train_fusion import extract_pairs

        trials = TrialList.load(trial_path)
        store = extract_pairs(self.trainer, self.cfg, trials.unique_utts)
        eer, thr = self._trial_eer(trials, store)
        self.threshold = float(thr)
        return float(eer), float(thr)
