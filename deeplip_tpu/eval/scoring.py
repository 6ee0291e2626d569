"""Trial-list verification scoring as batched device math.

The reference scores 20k-trial lists with a Python loop — per trial it
``np.load``s two ``.npy`` embeddings and calls sklearn cosine_similarity
(``models/audio_models/utils.py:234-283``), and the fusion back-ends repeat
per-trial filesystem globs (``utils.py:331-523``). Here scoring is:

    unique utterances -> one embedding matrix (N, D)
                      -> L2-normalize (one fused op)
                      -> gather the (M, 2) trial index pairs
                      -> one batched row-wise dot on the MXU

which turns 20k Python iterations into one device launch. The EER formula
on the resulting scores is byte-identical to the reference
(:func:`deeplip_tpu.eval.eer.eer_from_scores`).

``EmbeddingStore`` also reads/writes the reference's on-disk layout
(per-utterance ``.npy`` under an exp dir, ``train_audio.py:367-370``) so
embeddings can be exchanged with the PyTorch implementation for parity runs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from deeplip_tpu.eval.eer import eer_from_scores


@dataclass
class TrialList:
    """A verification trial list: labels plus utterance-pair names.

    Parses the reference's format — ``<0|1> <utt1> <utt2>`` per line
    (``database/trial_grid_v1.txt`` / ``trial_lomgrid_v1.txt``).
    """

    labels: np.ndarray  # (M,) int8
    utt1: list[str]
    utt2: list[str]

    @classmethod
    def load(cls, path: str) -> "TrialList":
        labels, u1, u2 = [], [], []
        with open(path, "r") as f:
            for line in f:
                line = line.rstrip()
                if not line:
                    continue
                lab, a, b = line.split(" ")
                labels.append(int(lab))
                u1.append(a)
                u2.append(b)
        return cls(np.asarray(labels, np.int8), u1, u2)

    @property
    def unique_utts(self) -> list[str]:
        seen: dict[str, None] = {}
        for u in self.utt1 + self.utt2:
            seen.setdefault(u)
        return list(seen)

    def index_pairs(self, utt_index: Mapping[str, int]) -> np.ndarray:
        return np.asarray(
            [[utt_index[a], utt_index[b]] for a, b in zip(self.utt1, self.utt2)],
            np.int32,
        )

    def __len__(self) -> int:
        return len(self.labels)


@dataclass
class EmbeddingStore:
    """utterance-name -> embedding map with reference-layout npy IO."""

    table: dict[str, np.ndarray] = field(default_factory=dict)

    def __setitem__(self, utt: str, emb: np.ndarray) -> None:
        self.table[utt] = np.asarray(emb).reshape(-1)

    def __getitem__(self, utt: str) -> np.ndarray:
        return self.table[utt]

    def __contains__(self, utt: str) -> bool:
        return utt in self.table

    def __len__(self) -> int:
        return len(self.table)

    def matrix(self, utts: Iterable[str]) -> np.ndarray:
        return np.stack([self.table[u] for u in utts])

    # ---- reference on-disk layout ------------------------------------
    def save_npy_tree(self, root: str) -> None:
        """One ``<root>/<utt-with-.wav-suffix-stripped>.npy`` per utterance
        (suffix only: a mid-name '.wav' must survive, matching the
        reference's ``f.replace('.wav', '.npy')`` tree for normal names)."""
        for utt, emb in self.table.items():
            path = os.path.join(root, utt.removesuffix(".wav") + ".npy")
            os.makedirs(os.path.dirname(path) or root, exist_ok=True)
            np.save(path, emb)

    @classmethod
    def load_npy_tree(cls, root: str, utts: Iterable[str]) -> "EmbeddingStore":
        store = cls()
        for utt in utts:
            store[utt] = np.load(os.path.join(root, utt.removesuffix(".wav") + ".npy"))
        return store

    # ---- Kaldi x-vector interop (≙ transform_{to,from}_kaldi_xv,
    # train_audio.py:443-471) -------------------------------------------
    def save_kaldi(self, ark_path: str, scp_path: str | None = None) -> None:
        from deeplip_tpu.interop.kaldi import write_ark_scp

        write_ark_scp(self.table, ark_path, scp_path)

    @classmethod
    def load_kaldi(cls, scp_path: str) -> "EmbeddingStore":
        from deeplip_tpu.interop.kaldi import read_scp

        store = cls()
        for utt, vec in read_scp(scp_path):
            store[utt] = vec
        return store


@partial(jax.jit, static_argnames=("normalize",))
def cosine_scores(
    embeddings: jnp.ndarray, pairs: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """``(N, D) x (M, 2) -> (M,)`` cosine similarity of gathered pairs."""
    e = embeddings
    if normalize:
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)
    a = jnp.take(e, pairs[:, 0], axis=0)
    b = jnp.take(e, pairs[:, 1], axis=0)
    return jnp.sum(a * b, axis=-1)


def cosine_scores_np(
    embeddings: np.ndarray, pairs: np.ndarray, normalize: bool = True
) -> np.ndarray:
    """Host (numpy float32) twin of :func:`cosine_scores`.

    Same math, same dtype, no device dispatch — for latency-sensitive
    batch-1 serving where the score work is a handful of dot products and
    a device launch costs a full host→device round-trip (measured: a
    2×D cosine is ~1 µs of MXU work behind a ~30-40 ms relay RTT on the
    dev rig, ~1 ms on PCIe). Agrees with the device path to f32 roundoff
    (different accumulation order), far inside any operating margin.
    """
    e = np.asarray(embeddings, np.float32)
    if normalize:
        e = e / np.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)
    a = e[np.asarray(pairs)[:, 0]]
    b = e[np.asarray(pairs)[:, 1]]
    return np.sum(a * b, axis=-1)


def trial_matrix_pairs(trials: TrialList, store: EmbeddingStore):
    """Shared gather for every back-end: the unique-utterance embedding
    matrix and the (M, 2) index pairs of the trial list."""
    utts = trials.unique_utts
    index = {u: i for i, u in enumerate(utts)}
    return store.matrix(utts), trials.index_pairs(index)


def _trial_scores(trials: TrialList, store: EmbeddingStore) -> np.ndarray:
    emb, pairs = trial_matrix_pairs(trials, store)
    return np.asarray(cosine_scores(jnp.asarray(emb, jnp.float32),
                                    jnp.asarray(pairs)))


def cosine_eer(trials: TrialList, store: EmbeddingStore) -> tuple[float, float]:
    """Cosine back-end EER over a trial list (≙ ``eer_cos_*``)."""
    return eer_from_scores(trials.labels, _trial_scores(trials, store))


def score_fusion_eer(
    trials: TrialList,
    audio_store: EmbeddingStore,
    video_store: EmbeddingStore,
    audio_weight: float = 0.5,
    video_weight: float = 0.5,
) -> tuple[float, float]:
    """Late score-level fusion (≙ ``eer_cos_*_scorefusion``, weights at
    ``models/audio_models/utils.py:344,376``)."""
    sa = _trial_scores(trials, audio_store)
    sv = _trial_scores(trials, video_store)
    return eer_from_scores(trials.labels, audio_weight * sa + video_weight * sv)


def feature_normalize(vec: np.ndarray) -> np.ndarray:
    """Z-norm across the embedding's own dimensions
    (``models/audio_models/utils.py:525-528``)."""
    mu = np.mean(vec, axis=0)
    std = np.std(vec, axis=0)
    return (vec - mu) / std


def feature_fusion_eer(
    trials: TrialList,
    audio_store: EmbeddingStore,
    video_store: EmbeddingStore,
) -> tuple[float, float]:
    """Embedding-level fusion: per-modality z-norm, concat [video, audio],
    cosine (≙ ``eer_cos_*_featurefusion``, ``utils.py:465-473``)."""
    utts = trials.unique_utts
    index = {u: i for i, u in enumerate(utts)}
    av = np.stack([feature_normalize(audio_store[u].reshape(-1)) for u in utts])
    vv = np.stack([feature_normalize(video_store[u].reshape(-1)) for u in utts])
    fused = np.concatenate([vv, av], axis=1)
    pairs = jnp.asarray(trials.index_pairs(index))
    scores = np.asarray(cosine_scores(jnp.asarray(fused, jnp.float32), pairs))
    return eer_from_scores(trials.labels, scores)
