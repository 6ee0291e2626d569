"""Speaker verification / identification service over a trained audio model.

Built entirely from the framework's existing parity-grade pieces — the
jitted PCM→embedding path (``AudioTrainer._embed_fn``: on-device DSP +
network + LMCL-path L2 norm, ``/root/reference/train_audio.py:318-320``),
length-bucketed batched extraction (``EvalUtteranceSet``), and the
reference-exact EER/threshold backend (``eval/eer.py``) — so a verify
decision here is consistent with the offline trial protocol. (Batch-1
scoring below ``host_score_macs`` runs on numpy f32 twins of the device
scoring ops to skip dispatch round-trips; scores agree with the device
back-end to f32 roundoff, ~1e-7 — operating thresholds are calibrated at
~1e-2 score granularity, so decisions are unaffected.)

Semantics (shared with :class:`deeplip_tpu.serve.av.AVSpeakerVerifier`):

- **enroll**: the speaker profile is the L2-normalized mean of the
  utterance embeddings (standard x-vector multi-session enrollment; with
  one utterance this reduces to the utterance embedding, so verify ==
  the trial protocol's cosine exactly).
- **verify**: cosine(profile, utterance) ≥ threshold. The threshold comes
  from :meth:`calibrate` — the EER operating point of a trial list scored
  with THIS model (the same ``(eer, threshold)`` the reference's ``eer()``
  returns, ``models/audio_models/utils.py:246-249``) — or is set directly.
- **identify**: ranked cosine against all enrolled profiles.
- **score normalization**: with an impostor cohort set
  (:meth:`ProfileVerifier.set_cohort`), every score — including the
  calibrated threshold — is adaptively normalized
  (:mod:`deeplip_tpu.eval.snorm` AS-norm), the standard production
  technique for keeping one threshold calibrated across conditions.

Batched and device-resident: enrollment/verification PCM goes through the
same bucketed batches as the 89k-trials/sec extraction sweep, so serving
throughput == extraction throughput.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Sequence

import numpy as np

from deeplip_tpu.core.config import Config, load_audio_config
from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
from deeplip_tpu.eval.scoring import EmbeddingStore, TrialList
from deeplip_tpu.train.audio import AudioTrainer


@dataclasses.dataclass
class VerifyResult:
    speaker: str
    score: float
    threshold: float
    accept: bool


def _l2(v: np.ndarray) -> np.ndarray:
    return v / max(float(np.linalg.norm(v)), 1e-12)


def cohort_fingerprint(cohort: np.ndarray | None, top_k: int = 200) -> str | None:
    """Stable identity of an AS-norm scoring scale: a short hash of the
    cohort matrix bytes + ``top_k`` (``None`` = raw-cosine scoring).
    Thresholds are only valid on the scale they were calibrated on, so
    persisted thresholds carry this fingerprint and loaders refuse a
    threshold whose fingerprint does not match the active cohort."""
    if cohort is None:
        return None
    import hashlib

    m = np.ascontiguousarray(np.asarray(cohort, np.float32))
    h = hashlib.sha256(m.tobytes())
    h.update(str(m.shape).encode())
    h.update(str(int(top_k)).encode())
    return h.hexdigest()[:16]


class ProfileVerifier:
    """Enrollment-profile store + cosine decisions, embedding-agnostic.

    Subclasses provide ``_embed_one(item) -> np.ndarray`` (any norm — it is
    re-normalized here) and ``_is_single_item(x)``."""

    #: scoring work below this many MACs runs on the HOST (numpy f32 twins
    #: of the device scoring ops) instead of dispatching to the device —
    #: batch-1 verify/identify scoring is a handful of dot products behind
    #: a full dispatch round-trip otherwise (measured: scoring dispatches
    #: were ~half the serve p50 on the dev rig). 8M MACs ≈ well under 10 ms
    #: of host numpy; large sweeps (calibrate, big identify×cohort) stay on
    #: device. Set to 0 to force every score onto the device back-end.
    host_score_macs: int = 8_000_000

    def __init__(self, threshold: float | None = None):
        self.threshold = threshold
        self.profiles: dict[str, np.ndarray] = {}
        self.cohort: np.ndarray | None = None
        self.cohort_top_k = 200

    def _embed_one(self, item) -> np.ndarray:
        raise NotImplementedError

    def _is_single_item(self, x) -> bool:
        raise NotImplementedError

    # -- enrollment ------------------------------------------------------
    def enroll(self, speaker: str, items) -> np.ndarray:
        """Enroll ``speaker`` from one or more utterances. Profile =
        L2-normalized mean of unit-normalized utterance embeddings.
        Re-enrolling replaces the profile."""
        if self._is_single_item(items):
            items = [items]
        embs = [_l2(np.asarray(self._embed_one(it)).reshape(-1))
                for it in items]
        self.profiles[speaker] = _l2(np.mean(embs, axis=0))
        return self.profiles[speaker]

    # -- score normalization ----------------------------------------------
    def set_cohort(self, cohort, top_k: int = 200) -> None:
        """Enable adaptive score normalization (AS-norm,
        :mod:`deeplip_tpu.eval.snorm`): every subsequent :meth:`score` /
        :meth:`verify` / :meth:`identify` / :meth:`calibrate` score is
        normalized against this impostor cohort's top-``top_k`` cosines,
        so one threshold stays calibrated across conditions. ``cohort`` is
        a ``(C, D)`` embedding matrix, an ``EmbeddingStore``, or a
        ``{name: vec}`` mapping — typically embeddings of held-out
        impostor utterances extracted with this same model. Pass ``None``
        to return to raw cosine scoring.

        Changing the cohort changes the scoring SCALE, so any operating
        threshold (calibrated on the previous scale) is invalidated:
        ``self.threshold`` is reset to ``None`` and :meth:`verify` refuses
        to decide until :meth:`calibrate` runs again (or a threshold known
        to belong to the new scale is set explicitly)."""
        if cohort is None:
            if self.cohort is not None:
                self.threshold = None  # normalized-scale threshold is stale
            self.cohort = None
            return
        from deeplip_tpu.eval.snorm import cohort_matrix

        self.cohort = cohort_matrix(cohort)
        self.cohort_top_k = int(top_k)
        self.threshold = None  # raw-scale threshold is stale on this scale

    def _pair_scores(self, emb: np.ndarray, pairs: np.ndarray) -> np.ndarray:
        """Raw or AS-normed cosines for index ``pairs`` into ``emb`` rows.

        Tiny scoring jobs (< ``host_score_macs`` multiply-accumulates) run
        on the host via the numpy f32 twins (``cosine_scores_np`` /
        ``asnorm_trial_scores_np``) — zero device dispatches, agreement to
        f32 roundoff; everything larger goes to the device back-end."""
        emb = np.asarray(emb, np.float32)
        pairs = np.asarray(pairs, np.int32)
        n, d = emb.shape
        if self.cohort is None:
            macs = (n + len(pairs)) * d
            if macs < self.host_score_macs:
                from deeplip_tpu.eval.scoring import cosine_scores_np

                return cosine_scores_np(emb, pairs)
            from deeplip_tpu.eval.scoring import cosine_scores

            return np.asarray(cosine_scores(emb, pairs))
        macs = (n + len(pairs)) * d + n * self.cohort.shape[0] * d
        if macs < self.host_score_macs:
            from deeplip_tpu.eval.snorm import asnorm_trial_scores_np

            return asnorm_trial_scores_np(emb, pairs, self.cohort,
                                          self.cohort_top_k)
        from deeplip_tpu.eval.snorm import asnorm_trial_scores

        return asnorm_trial_scores(emb, pairs, self.cohort, self.cohort_top_k)

    def _trial_eer(self, trials, store) -> tuple[float, float]:
        """Trial-list (eer, threshold) under the active scoring back-end —
        the same normalization :meth:`score` applies, so the calibrated
        threshold and the serving scores live on one scale."""
        from deeplip_tpu.eval.eer import eer_from_scores
        from deeplip_tpu.eval.scoring import trial_matrix_pairs

        emb, pairs = trial_matrix_pairs(trials, store)
        return eer_from_scores(trials.labels, self._pair_scores(emb, pairs))

    # -- decisions -------------------------------------------------------
    # Each decision is embed → score-on-embedding; the *_embedding methods
    # take an already-computed embedding so a batching front-end
    # (:class:`deeplip_tpu.serve.microbatch.MicroBatcher`) can coalesce the
    # embed dispatches across concurrent requests and finish each request
    # with the same scoring code the direct calls use.
    def score_embedding(self, speaker: str, e: np.ndarray) -> float:
        """:meth:`score` for an already-computed utterance embedding."""
        if speaker not in self.profiles:
            raise KeyError(f"speaker {speaker!r} is not enrolled")
        emb = np.stack([self.profiles[speaker], _l2(e.reshape(-1))])
        return float(self._pair_scores(emb, np.asarray([[0, 1]]))[0])

    def verify_embedding(self, speaker: str, e: np.ndarray) -> VerifyResult:
        """:meth:`verify` for an already-computed utterance embedding."""
        if self.threshold is None:
            raise ValueError(
                "no operating threshold: call calibrate(...) or construct "
                "with threshold=")
        s = self.score_embedding(speaker, e)
        return VerifyResult(speaker=speaker, score=s,
                            threshold=self.threshold,
                            accept=bool(s >= self.threshold))

    def score(self, speaker: str, item) -> float:
        """Similarity between the speaker's profile and ``item``: cosine,
        or its AS-normed value when a cohort is set."""
        if speaker not in self.profiles:
            raise KeyError(f"speaker {speaker!r} is not enrolled")
        e = np.asarray(self._embed_one(item))
        return self.score_embedding(speaker, e)

    def verify(self, speaker: str, item) -> VerifyResult:
        if self.threshold is None:
            raise ValueError(
                "no operating threshold: call calibrate(...) or construct "
                "with threshold=")
        s = self.score(speaker, item)
        return VerifyResult(speaker=speaker, score=s,
                            threshold=self.threshold,
                            accept=bool(s >= self.threshold))

    def identify_embedding(self, e: np.ndarray,
                           top_k: int = 1) -> list[tuple[str, float]]:
        """:meth:`identify` for an already-computed utterance embedding."""
        if not self.profiles:
            raise ValueError("no speakers enrolled")
        e = _l2(np.asarray(e).reshape(-1))
        names = list(self.profiles)
        emb = np.stack([self.profiles[n] for n in names] + [e])
        pairs = np.stack([np.arange(len(names)),
                          np.full(len(names), len(names))], axis=1)
        scores = self._pair_scores(emb, pairs)
        order = np.argsort(-scores)[:top_k]
        return [(names[i], float(scores[i])) for i in order]

    def identify(self, item, top_k: int = 1) -> list[tuple[str, float]]:
        """Ranked ``(speaker, score)`` over all enrolled profiles (scored
        like :meth:`score`: raw cosine, or AS-normed when a cohort is set —
        profile-side cohort stats differ per speaker, so normalization can
        legitimately change the ranking)."""
        if not self.profiles:
            raise ValueError("no speakers enrolled")
        return self.identify_embedding(
            np.asarray(self._embed_one(item)), top_k=top_k)

    # -- persistence -----------------------------------------------------
    def save_profiles(self, out_dir: str) -> None:
        store = EmbeddingStore()
        for name, emb in self.profiles.items():
            store[name] = emb
        store.save_npy_tree(out_dir)

    def load_profiles(self, out_dir: str) -> None:
        for dirpath, _dirs, files in os.walk(out_dir):
            for f in files:
                if f.endswith(".npy"):
                    rel = os.path.relpath(os.path.join(dirpath, f), out_dir)
                    name = rel[:-len(".npy")]
                    self.profiles[name] = _l2(
                        np.load(os.path.join(dirpath, f)).reshape(-1))


class SpeakerVerifier(ProfileVerifier):
    """Enroll/verify/identify on top of a trained audio embedding model.

    Args:
        config: an audio config path or loaded :class:`Config` (the same
            file the trainer uses; only ``data.python_data_config``,
            ``model`` and ``test`` sections matter for serving).
        checkpoint: optional checkpoint to load — our orbax
            ``exp/<t>/net_<tag>`` dir or a reference torch ``.pth``
            (dispatch by suffix, like the train CLIs).
        threshold: accept threshold for :meth:`verify`; usually left unset
            and obtained from :meth:`calibrate`.
    """

    def __init__(self, config: str | Config, checkpoint: str | None = None,
                 threshold: float | None = None, exp_root: str = "exp",
                 mesh=None):
        super().__init__(threshold)
        cfg = load_audio_config(config) if isinstance(config, str) else config
        is_pth = checkpoint is not None and str(checkpoint).endswith(".pth")
        if checkpoint and not is_pth:
            cfg.train["resume"] = str(checkpoint)
        # serving needs no training data; without a manifest the trainer
        # would derive n_spk=0 and a zero-row criterion breaks param init.
        # The criterion never runs here (embedding extraction only) — any
        # positive row count works; checkpoint loads restore the model
        # subtree and leave the criterion initialized.
        n_spk = int(cfg.train.get("n_spk", 0)) or 1
        self.trainer = AudioTrainer(cfg, mesh=mesh, exp_root=exp_root,
                                    n_spk=n_spk)
        if is_pth:
            self.trainer.load_torch_checkpoint(str(checkpoint))

    # -- embedding -------------------------------------------------------
    def _utt_set(self, utts: Sequence[EvalUtterance], reader=None,
                 set_overrides: Mapping | None = None) -> EvalUtteranceSet:
        from deeplip_tpu.data.audio_pipeline import eval_set_kwargs

        t = self.trainer
        test_opts = dict(t.test_opts)
        if set_overrides:
            test_opts.update(set_overrides)
        kw = eval_set_kwargs(t.feat_cfg, test_opts)
        if reader is not None:
            kw["reader"] = reader
        return EvalUtteranceSet(utts, **kw)

    def embed_files(self, named_paths: Mapping[str, str]) -> EmbeddingStore:
        """Batched embeddings for ``{name: wav_path}``."""
        utts = [EvalUtterance(n, p) for n, p in named_paths.items()]
        return self.trainer.extract_embeddings(self._utt_set(utts))

    def embed_pcm(self, named_pcm: Mapping[str, np.ndarray],
                  rate: int | None = None,
                  set_overrides: Mapping | None = None) -> EmbeddingStore:
        """Batched embeddings for in-memory PCM ``{name: float32 samples}``
        (production path: no filesystem round-trip). ``set_overrides``
        overlays ``test_opts`` for this call only (the micro-batching
        front-end pins ``n_buckets: 0`` so online batches reuse a small
        fixed set of compiled shapes instead of corpus-adaptive edges)."""
        sr = int(rate or self.trainer.feat_cfg.rate)
        table = {n: np.asarray(p, np.float32) for n, p in named_pcm.items()}
        utts = [EvalUtterance(n, n) for n in table]
        reader = lambda key: (table[key], sr)  # noqa: E731
        return self.trainer.extract_embeddings(
            self._utt_set(utts, reader=reader, set_overrides=set_overrides))

    def _is_single_item(self, x) -> bool:
        return isinstance(x, (str, np.ndarray))

    def _embed_one(self, wav: str | np.ndarray) -> np.ndarray:
        if isinstance(wav, str):
            return self.embed_files({"_": wav})["_"]
        return self.embed_pcm({"_": wav})["_"]

    # -- calibration -----------------------------------------------------
    def calibrate(self, trial_path: str, root: str = ".") -> tuple[float, float]:
        """Extract every utterance in a trial list with this model, compute
        the reference-exact EER, and adopt its threshold as the operating
        point. Returns ``(eer, threshold)``."""
        trials = TrialList.load(trial_path)
        store = self.embed_files(
            {u: os.path.join(root, u) for u in trials.unique_utts})
        eer, thr = self._trial_eer(trials, store)
        self.threshold = float(thr)
        return float(eer), float(thr)

    def set_cohort_files(self, wav_paths: Sequence[str],
                         top_k: int = 200) -> None:
        """Build the AS-norm cohort by embedding ``wav_paths`` (held-out
        impostor utterances) with this model, then :meth:`set_cohort`."""
        store = self.embed_files({p: p for p in wav_paths})
        self.set_cohort(store, top_k=top_k)
