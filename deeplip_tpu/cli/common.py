"""Shared CLI helpers: test-set discovery from trial lists, mode plumbing."""

from __future__ import annotations

import os

from deeplip_tpu.data.audio_pipeline import EvalUtterance
from deeplip_tpu.eval.scoring import TrialList


def utterances_from_trials(trial_path: str, root: str) -> list[EvalUtterance]:
    """Unique trial utterances resolved against a wav root directory."""
    trials = TrialList.load(trial_path)
    return [EvalUtterance(name, os.path.join(root, name)) for name in trials.unique_utts]


def labels_from_speaker_prefix(names: list[str]) -> list[int]:
    """LOMGRID-style labels: ``s<NN>_...`` filename prefix → int(NN)
    (≙ ``train_audio.py:334``)."""
    out = []
    for name in names:
        base = os.path.basename(name)
        out.append(int(base.split("_")[0].replace("s", "")))
    return out
