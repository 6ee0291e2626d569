"""Adaptive score normalization (AS-norm) for verification scoring.

The reference scores raw cosines only (``models/audio_models/utils.py:
234-283``). Production speaker-verification systems additionally normalize
each trial score against an impostor cohort so one decision threshold
stays calibrated across recording conditions — the top-K adaptive variant
("AS-norm1": Matejka et al., *Analysis of Score Normalization in
Multilingual Speaker Recognition*, Interspeech 2017; also Cumani et al.
2011). This module is that back-end, computed the TPU way:

    every utterance-vs-cohort cosine  ->  ONE (N, D) x (D, C) MXU matmul
    per-utterance top-K cohort scores ->  ONE ``lax.top_k``
    per-trial normalization           ->  a gather over the trial pairs

no per-trial or per-cohort Python loops. For a trial ``(e, t)`` with raw
cosine ``s``:

    s' = 0.5 * ((s - mu_e) / sd_e  +  (s - mu_t) / sd_t)

where ``mu_e, sd_e`` are the mean/std of ``e``'s top-K cohort cosines
(population std, the convention of the published recipes). With
``top_k >= C`` this reduces to plain (non-adaptive) S-norm.

This is an extension beyond the reference's surface; raw-cosine scoring
(:func:`deeplip_tpu.eval.scoring.cosine_eer`) stays the parity default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deeplip_tpu.eval.eer import eer_from_scores
from deeplip_tpu.eval.scoring import (
    EmbeddingStore,
    TrialList,
    cosine_scores,
    trial_matrix_pairs,
)


def _unit(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


@partial(jax.jit, static_argnames=("top_k",))
def cohort_topk_stats(
    embeddings: jnp.ndarray, cohort: jnp.ndarray, top_k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-embedding ``(mu, sd)`` of its ``top_k`` cohort cosines.

    ``embeddings (N, D)``, ``cohort (C, D)`` (any norm; both are
    L2-normalized here) -> two ``(N,)`` vectors. ``top_k`` is clamped to
    ``C``. ``sd`` is the population std, floored at 1e-12 so a degenerate
    cohort (all-identical scores) cannot produce inf/NaN.
    """
    k = min(int(top_k), cohort.shape[0])
    # pinned precision: TPU f32 matmuls default to single-pass bf16, and sd
    # is a small difference of clustered cohort scores — bf16 rounding would
    # shift normalized scores/thresholds (same pin as losses/triplet.py:31;
    # the extraction path wraps in default_matmul_precision('high')).
    scores = jnp.matmul(
        _unit(embeddings), _unit(cohort).T,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, C) — one MXU matmul
    top, _ = jax.lax.top_k(scores, k)
    mu = jnp.mean(top, axis=-1)
    sd = jnp.sqrt(jnp.mean(jnp.square(top - mu[:, None]), axis=-1))
    return mu, jnp.maximum(sd, 1e-12)


@jax.jit
def asnorm_from_stats(
    raw_scores: jnp.ndarray,
    pairs: jnp.ndarray,
    mu: jnp.ndarray,
    sd: jnp.ndarray,
) -> jnp.ndarray:
    """Normalize ``(M,)`` raw pair scores with per-utterance cohort stats:
    ``0.5 * ((s - mu_a)/sd_a + (s - mu_b)/sd_b)`` gathered via ``(M, 2)``
    ``pairs`` indices into the ``(N,)`` stat vectors."""
    mu_a, mu_b = jnp.take(mu, pairs[:, 0]), jnp.take(mu, pairs[:, 1])
    sd_a, sd_b = jnp.take(sd, pairs[:, 0]), jnp.take(sd, pairs[:, 1])
    return 0.5 * ((raw_scores - mu_a) / sd_a + (raw_scores - mu_b) / sd_b)


def cohort_matrix(cohort) -> np.ndarray:
    """Coerce a cohort — ``(C, D)`` array, :class:`EmbeddingStore`, or a
    ``{name: vec}`` mapping — to a float32 matrix."""
    if isinstance(cohort, EmbeddingStore):
        return cohort.matrix(list(cohort.table)).astype(np.float32)
    if isinstance(cohort, dict):
        return np.stack([np.asarray(v).reshape(-1) for v in cohort.values()]).astype(
            np.float32
        )
    m = np.asarray(cohort, np.float32)
    if m.ndim != 2:
        raise ValueError(f"cohort must be (C, D); got shape {m.shape}")
    return m


def asnorm_trial_scores(
    emb: np.ndarray, pairs: np.ndarray, cohort, top_k: int = 200
) -> np.ndarray:
    """AS-normed cosine scores for ``(N, D)`` embeddings over ``(M, 2)``
    trial index pairs (the building block shared by the EER back-end and
    the serving path)."""
    e = jnp.asarray(emb, jnp.float32)
    p = jnp.asarray(pairs)
    raw = cosine_scores(e, p)
    mu, sd = cohort_topk_stats(e, jnp.asarray(cohort_matrix(cohort)), top_k)
    return np.asarray(asnorm_from_stats(raw, p, mu, sd))


def asnorm_trial_scores_np(
    emb: np.ndarray, pairs: np.ndarray, cohort, top_k: int = 200
) -> np.ndarray:
    """Host (numpy float32) twin of :func:`asnorm_trial_scores`.

    Same formulas — L2-normalize, one (N, C) cosine matrix, top-K via
    ``np.partition``, population std floored at 1e-12, the 0.5·(z_a + z_b)
    combination — with no device dispatches, for latency-sensitive batch-1
    serving (three relay round-trips otherwise). Agrees with the device
    path to f32 roundoff; the device path (``precision=HIGHEST``) remains
    the offline back-end.
    """
    from deeplip_tpu.eval.scoring import cosine_scores_np

    e = np.asarray(emb, np.float32)
    p = np.asarray(pairs)
    raw = cosine_scores_np(e, p)
    c = cohort_matrix(cohort)
    k = min(int(top_k), c.shape[0])
    eu = e / np.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)
    cu = c / np.linalg.norm(c, axis=-1, keepdims=True).clip(1e-12)
    scores = eu @ cu.T  # (N, C)
    top = -np.partition(-scores, k - 1, axis=-1)[:, :k]
    mu = np.mean(top, axis=-1)
    sd = np.maximum(
        np.sqrt(np.mean(np.square(top - mu[:, None]), axis=-1)), 1e-12)
    mu_a, mu_b = mu[p[:, 0]], mu[p[:, 1]]
    sd_a, sd_b = sd[p[:, 0]], sd[p[:, 1]]
    return 0.5 * ((raw - mu_a) / sd_a + (raw - mu_b) / sd_b)


def asnorm_eer(
    trials: TrialList,
    store: EmbeddingStore,
    cohort,
    top_k: int = 200,
) -> tuple[float, float]:
    """Trial-list EER/threshold over AS-normed scores (the cohort-normalized
    counterpart of :func:`deeplip_tpu.eval.scoring.cosine_eer`)."""
    emb, pairs = trial_matrix_pairs(trials, store)
    scores = asnorm_trial_scores(emb, pairs, cohort, top_k)
    return eer_from_scores(trials.labels, scores)
