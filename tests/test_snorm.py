"""AS-norm scoring back-end (eval/snorm.py): math vs a naive per-trial
reference, edge cases, EER integration."""

import numpy as np
import pytest

from deeplip_tpu.eval.scoring import EmbeddingStore, TrialList
from deeplip_tpu.eval.snorm import (
    asnorm_eer,
    asnorm_trial_scores,
    cohort_matrix,
    cohort_topk_stats,
)


def _naive_asnorm(emb, pairs, cohort, top_k):
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    c = cohort / np.linalg.norm(cohort, axis=1, keepdims=True)
    big = e @ c.T
    k = min(top_k, c.shape[0])
    out = []
    for a, b in pairs:
        s = float(np.dot(e[a], e[b]))
        za = np.sort(big[a])[::-1][:k]
        zb = np.sort(big[b])[::-1][:k]
        out.append(0.5 * ((s - za.mean()) / za.std()
                          + (s - zb.mean()) / zb.std()))
    return np.asarray(out)


def test_matches_naive_reference():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    cohort = rng.standard_normal((30, 16)).astype(np.float32)
    pairs = rng.integers(0, 12, (50, 2)).astype(np.int32)
    for top_k in (5, 30):
        got = asnorm_trial_scores(emb, pairs, cohort, top_k=top_k)
        np.testing.assert_allclose(
            got, _naive_asnorm(emb, pairs, cohort, top_k), rtol=0, atol=2e-5)


def test_host_twin_matches_device_path():
    """asnorm_trial_scores_np (the zero-dispatch serving fallback) must
    agree with the jitted device path to f32 roundoff — same normalize,
    top-K, population-std-floor and 0.5(z_a+z_b) formulas."""
    from deeplip_tpu.eval.snorm import asnorm_trial_scores_np

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    cohort = rng.standard_normal((30, 16)).astype(np.float32)
    pairs = rng.integers(0, 12, (50, 2)).astype(np.int32)
    # both sides are f32 pipelines with different accumulation order, and
    # normalized scores are O(10) z-scores: agreement is f32-roundoff-level
    # (measured ~1.5e-5 max), far inside any operating margin
    for top_k in (5, 30, 100):
        np.testing.assert_allclose(
            asnorm_trial_scores_np(emb, pairs, cohort, top_k=top_k),
            asnorm_trial_scores(emb, pairs, cohort, top_k=top_k),
            rtol=0, atol=5e-5)
    # degenerate cohort: the 1e-12 std floor must match too
    const = np.tile(np.ones((1, 16), np.float32), (5, 1))
    got = asnorm_trial_scores_np(
        np.eye(3, 16, dtype=np.float32), np.asarray([[0, 1]], np.int32),
        const, top_k=5)
    assert np.all(np.isfinite(got))


def test_topk_clamped_to_cohort_size():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    cohort = rng.standard_normal((6, 8)).astype(np.float32)
    pairs = np.asarray([[0, 1], [2, 3]], np.int32)
    np.testing.assert_allclose(
        asnorm_trial_scores(emb, pairs, cohort, top_k=100),
        asnorm_trial_scores(emb, pairs, cohort, top_k=6), atol=0)


def test_degenerate_cohort_is_finite():
    # all-identical cohort rows -> zero std; the floor must keep scores finite
    emb = np.eye(3, 8, dtype=np.float32)
    cohort = np.tile(np.ones((1, 8), np.float32), (5, 1))
    s = asnorm_trial_scores(emb, np.asarray([[0, 1]], np.int32), cohort, top_k=5)
    assert np.all(np.isfinite(s))


def test_cohort_matrix_coercions():
    rng = np.random.default_rng(2)
    m = rng.standard_normal((4, 8)).astype(np.float32)
    store = EmbeddingStore()
    for i, row in enumerate(m):
        store[f"u{i}"] = row
    np.testing.assert_array_equal(cohort_matrix(m), m)
    np.testing.assert_array_equal(cohort_matrix(store), m)
    np.testing.assert_array_equal(
        cohort_matrix({f"u{i}": m[i] for i in range(4)}), m)
    with pytest.raises(ValueError):
        cohort_matrix(m[0])


def test_stats_shapes_and_values():
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((7, 8)).astype(np.float32)
    cohort = rng.standard_normal((9, 8)).astype(np.float32)
    mu, sd = cohort_topk_stats(emb, cohort, top_k=4)
    assert mu.shape == (7,) and sd.shape == (7,)
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    c = cohort / np.linalg.norm(cohort, axis=1, keepdims=True)
    top = np.sort(e @ c.T, axis=1)[:, ::-1][:, :4]
    np.testing.assert_allclose(np.asarray(mu), top.mean(1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sd), top.std(1), atol=2e-6)


def test_asnorm_eer_separable_stays_zero():
    # two well-separated clusters: raw cosine EER is 0; a normalization that
    # preserves within-condition score ordering must keep it 0
    rng = np.random.default_rng(4)
    base = {0: rng.standard_normal(16), 1: rng.standard_normal(16)}
    store = EmbeddingStore()
    names, owner = [], {}
    for spk in (0, 1):
        for i in range(6):
            n = f"s{spk}/u{i}.wav"
            store[n] = base[spk] + 0.05 * rng.standard_normal(16)
            names.append(n)
            owner[n] = spk
    labels, u1, u2 = [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            labels.append(int(owner[a] == owner[b]))
            u1.append(a)
            u2.append(b)
    trials = TrialList(np.asarray(labels, np.int8), u1, u2)
    cohort = rng.standard_normal((20, 16)).astype(np.float32)
    eer, thr = asnorm_eer(trials, store, cohort, top_k=10)
    assert eer == pytest.approx(0.0, abs=1e-9)
    assert np.isfinite(thr)
