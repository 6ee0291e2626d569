"""Tests for trial scoring, EER, fusion back-ends, and PLDA."""

import os

import numpy as np
import pytest

from deeplip_tpu.eval.eer import eer_from_scores, eer_sweep
from deeplip_tpu.eval.scoring import (
    TrialList,
    EmbeddingStore,
    cosine_eer,
    score_fusion_eer,
    feature_fusion_eer,
    feature_normalize,
)
from deeplip_tpu.eval.plda import PLDA, plda_eer


def _synthetic_trials(n_spk=8, utts_per_spk=6, dim=32, noise=0.4, seed=0):
    """Speaker-clustered embeddings + a trial list with known structure."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_spk, dim))
    store = EmbeddingStore()
    names, spk_of = [], {}
    for s in range(n_spk):
        for u in range(utts_per_spk):
            name = f"s{s:02d}/u{u}.wav"
            store[name] = centers[s] + noise * rng.standard_normal(dim)
            names.append(name)
            spk_of[name] = s
    labels, u1s, u2s = [], [], []
    for _ in range(2000):
        a, b = rng.choice(len(names), 2, replace=False)
        labels.append(int(spk_of[names[a]] == spk_of[names[b]]))
        u1s.append(names[a])
        u2s.append(names[b])
    return TrialList(np.asarray(labels, np.int8), u1s, u2s), store, spk_of


def test_trial_list_parse(tmp_path):
    p = tmp_path / "trials.txt"
    p.write_text("1 s14/prbv1p.wav s14/brwl7n.wav\n0 s14/prbv1p.wav s15/xyz.wav\n")
    t = TrialList.load(str(p))
    assert len(t) == 2
    assert t.labels.tolist() == [1, 0]
    assert t.unique_utts == ["s14/prbv1p.wav", "s14/brwl7n.wav", "s15/xyz.wav"]


def test_reference_trial_lists_load():
    for name, n_spk in [("trial_grid_v1.txt", 33), ("trial_lomgrid_v1.txt", 36)]:
        path = os.path.join("/root/reference/database", name)
        if not os.path.exists(path):
            pytest.skip("reference database not mounted")
        t = TrialList.load(path)
        assert len(t) == 20000
        assert int(t.labels.sum()) == 4000


def test_cosine_eer_separates_clusters():
    trials, store, _ = _synthetic_trials(noise=0.3)
    eer, thr = cosine_eer(trials, store)
    assert 0.0 <= eer < 0.05
    trials_bad, store_bad, _ = _synthetic_trials(noise=5.0, seed=1)
    eer_bad, _ = cosine_eer(trials_bad, store_bad)
    assert eer_bad > eer


def test_eer_formula_matches_sweep():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 4000)
    scores = y * 1.0 + rng.standard_normal(4000)
    e1, _ = eer_from_scores(y, scores)
    e2, _ = eer_sweep(y, scores)
    assert abs(e1 - e2) < 0.01


def test_batched_scoring_matches_per_trial_loop():
    """The one-matmul scorer must agree with a per-trial cosine loop."""
    trials, store, _ = _synthetic_trials(n_spk=4, utts_per_spk=3)
    eer_fast, _ = cosine_eer(trials, store)
    scores = []
    for a, b in zip(trials.utt1, trials.utt2):
        va, vb = store[a], store[b]
        scores.append(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    eer_loop, _ = eer_from_scores(trials.labels, np.asarray(scores))
    assert abs(eer_fast - eer_loop) < 1e-9


def test_score_fusion_improves_over_weak_modality():
    trials, astore, spk_of = _synthetic_trials(noise=0.6, seed=3)
    rng = np.random.default_rng(4)
    vstore = EmbeddingStore()
    for name in astore.table:
        s = spk_of[name]
        center = np.zeros(16)
        center[s] = 3.0
        vstore[name] = center + 0.2 * rng.standard_normal(16)
    ea, _ = cosine_eer(trials, astore)
    ef, _ = score_fusion_eer(trials, astore, vstore)
    assert ef <= ea + 1e-9


def test_feature_fusion_runs():
    trials, astore, spk_of = _synthetic_trials(noise=0.5, seed=5)
    vstore = EmbeddingStore()
    rng = np.random.default_rng(6)
    for name in astore.table:
        vstore[name] = astore[name][:16] + 0.1 * rng.standard_normal(16)
    eer, thr = feature_fusion_eer(trials, astore, vstore)
    assert 0.0 <= eer <= 0.5


def test_feature_normalize_semantics():
    v = np.array([1.0, 2.0, 3.0, 4.0])
    out = feature_normalize(v)
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(out.std(), 1.0, atol=1e-12)


def test_npy_tree_roundtrip(tmp_path):
    _, store, _ = _synthetic_trials(n_spk=2, utts_per_spk=2)
    store.save_npy_tree(str(tmp_path))
    loaded = EmbeddingStore.load_npy_tree(str(tmp_path), store.table.keys())
    for k in store.table:
        np.testing.assert_array_equal(loaded[k], store[k])


def test_plda_fit_and_score():
    rng = np.random.default_rng(7)
    n_spk, per, dim = 10, 20, 32
    centers = 2.0 * rng.standard_normal((n_spk, dim))
    x = np.concatenate(
        [centers[s] + rng.standard_normal((per, dim)) for s in range(n_spk)]
    )
    labels = np.repeat(np.arange(n_spk), per)
    model = PLDA().fit(x, labels, n_principal_components=20)
    # same-speaker pairs must score higher on average than different-speaker
    same = model.score_pairs(centers + 0.5 * rng.standard_normal((n_spk, dim)),
                             centers + 0.5 * rng.standard_normal((n_spk, dim)))
    perm = np.roll(np.arange(n_spk), 1)
    diff = model.score_pairs(centers, centers[perm])
    assert same.mean() > diff.mean()


def test_plda_eer_on_synthetic_trials(tmp_path):
    trials, store, spk_of = _synthetic_trials(noise=0.4, seed=8)
    x = np.stack([store[u] for u in store.table])
    labels = np.asarray([spk_of[u] for u in store.table])
    model = PLDA().fit(x, labels, n_principal_components=16)
    eer, _ = plda_eer(trials, store, model)
    assert eer < 0.1
    # persistence round-trip
    path = str(tmp_path / "plda.npz")
    model.save(path)
    model2 = PLDA.load(path)
    eer2, _ = plda_eer(trials, store, model2)
    assert abs(eer - eer2) < 1e-12


def test_eer_sweep_handles_tied_scores():
    """A threshold accepts all of a tied-score group or none of it; the
    sweep must not cut inside a tie run (review r2 finding: quantized
    scores made eer_sweep understate EER vs the reference formula)."""
    rng = np.random.default_rng(5)
    labels = rng.integers(0, 2, 4000)
    scores = np.round(rng.standard_normal(4000) + 0.8 * labels, 1)  # heavy ties
    ref, _ = eer_from_scores(labels, scores)
    swept, _ = eer_sweep(labels, scores)
    assert abs(swept - ref) < 0.01, (swept, ref)


def test_plda_save_load_suffixless(tmp_path):
    """np.savez appends '.npz' to suffix-less paths; load must accept the
    path as given (e.g. mirroring the reference's 'plda.pkl'-style name)."""
    from deeplip_tpu.eval.plda import PLDA

    rng = np.random.default_rng(0)
    x = rng.standard_normal((60, 8)).astype(np.float64)
    y = np.repeat(np.arange(6), 10)
    m = PLDA().fit(x, y, n_principal_components=4)
    m.save(str(tmp_path / "plda_model"))
    m2 = PLDA.load(str(tmp_path / "plda_model"))
    np.testing.assert_allclose(m2.mean, m.mean)


def test_npy_tree_strips_suffix_only(tmp_path):
    """'.wav' is stripped as a suffix, not everywhere in the name (a
    mid-name '.wav' must survive, matching the reference's replace-based
    '<utt>.npy' tree for normal names)."""
    store = EmbeddingStore()
    store["a.wav_aug.wav"] = np.arange(4, dtype=np.float32)
    store["s1/normal.wav"] = np.ones(4, np.float32)
    store.save_npy_tree(str(tmp_path))
    assert (tmp_path / "a.wav_aug.npy").exists()
    assert (tmp_path / "s1" / "normal.npy").exists()
    back = EmbeddingStore.load_npy_tree(
        str(tmp_path), ["a.wav_aug.wav", "s1/normal.wav"])
    np.testing.assert_array_equal(back["a.wav_aug.wav"], store["a.wav_aug.wav"])


def test_plda_eer_exported():
    from deeplip_tpu.eval import plda_eer  # noqa: F401


# ---------------------------------------------------------------------------
# PLDA parity vs the reconstructed `plda` package (the reference's backend)
# ---------------------------------------------------------------------------

def _plda_dev_eval(n_spk, utts_per_spk, dim, seed, n_eval_spk=10,
                   n_pairs=400):
    """LOMGRID-dev-shaped synthetic data: a dev set to fit PLDA on and a
    disjoint eval set with labeled trial pairs (same/diff speakers)."""
    rng = np.random.default_rng(seed)
    centers = 2.0 * rng.standard_normal((n_spk + n_eval_spk, dim))
    within = rng.standard_normal((dim, dim)) * 0.1 + np.eye(dim) * 0.6

    def draw(s, n):
        return centers[s] + rng.standard_normal((n, dim)) @ within

    dev_x = np.concatenate([draw(s, utts_per_spk) for s in range(n_spk)])
    dev_y = np.repeat(np.arange(n_spk), utts_per_spk)
    eval_x = np.concatenate(
        [draw(n_spk + s, 4) for s in range(n_eval_spk)])
    eval_spk = np.repeat(np.arange(n_eval_spk), 4)
    pairs = rng.integers(0, len(eval_x), (n_pairs, 2))
    labels = (eval_spk[pairs[:, 0]] == eval_spk[pairs[:, 1]]).astype(np.int8)
    return dev_x, dev_y, eval_x, pairs, labels


@pytest.mark.parametrize(
    "n_spk,dim,n_pc",
    [
        (24, 64, 20),   # the reference recipe shape: PCA 20 < dim, all Ψ>0
        (12, 64, 20),   # rank(S_b)=11 < 20 latent dims -> zero-Ψ dims exist
        (10, 16, None),  # no PCA branch
    ],
)
def test_plda_matches_package_oracle(n_spk, dim, n_pc):
    """`eval/plda.py` must reproduce the `plda` package's protocol — the
    reference fits `plda.Classifier().fit_model(X, y,
    n_principal_components=20)` then scores trial pairs with
    `model.transform(..., 'D'->'U_model')` +
    `calc_same_diff_log_likelihood_ratio`
    (`/root/reference/train_audio.py:339-341`,
    `models/audio_models/utils.py:296-301`). The oracle is the vendored
    package reconstruction (`tests/third_party/plda`, Ioffe-2006
    closed-form fit). Fit internals (Ψ, mean) and per-trial LLRs must
    match; latent dims are compared through LLRs because per-dim latent
    signs are an eigenvector convention, invisible to the protocol."""
    from tests.third_party import plda as plda_pkg

    dev_x, dev_y, eval_x, pairs, labels = _plda_dev_eval(
        n_spk, 15, dim, seed=42 + n_spk)

    clf = plda_pkg.Classifier()
    clf.fit_model(dev_x, dev_y, n_principal_components=n_pc)
    ours = PLDA().fit(dev_x, dev_y, n_principal_components=n_pc)

    # ---- fit internals -------------------------------------------------
    # D-space mean: ours stores it directly; the package's lives in its
    # sklearn PCA (or, with no PCA, in the X-space m).
    if n_pc is not None and n_pc < dim:
        np.testing.assert_allclose(ours.mean, clf.model.pca.mean_,
                                   rtol=0, atol=1e-12)
    else:
        np.testing.assert_allclose(ours.mean, clf.model.m, rtol=0, atol=1e-12)

    # prior variances Ψ: both orderings are ascending-eigenvalue, so the
    # vectors are elementwise comparable (package keeps the diagonal matrix)
    psi_pkg = clf.model.Psi.diagonal()
    np.testing.assert_allclose(ours.psi, psi_pkg, rtol=1e-6, atol=1e-8)
    if n_pc is not None and n_spk - 1 < n_pc:
        assert (psi_pkg == 0).sum() >= n_pc - (n_spk - 1)  # zero-Ψ dims real

    # A^{-1}: latent axes match up to per-dim sign (eigenvector convention)
    # on the Ψ>0 dims. The Ψ=0 subspace is a degenerate eigenspace — any
    # orthogonal basis of it is a valid convention — and the package drops
    # those dims from 'U_model' anyway (they carry zero LLR weight).
    u_pkg = clf.model.transform(eval_x, from_space='D', to_space='U')
    u_ours = ours.transform(eval_x)
    live = psi_pkg > 0
    signs = np.sign(np.sum(u_pkg * u_ours, axis=0))
    np.testing.assert_allclose((u_ours * signs)[:, live], u_pkg[:, live],
                               rtol=1e-5, atol=1e-7)

    # ---- per-trial LLRs, exactly the reference's scoring loop -----------
    u_model = clf.model.transform(eval_x, from_space='D', to_space='U_model')
    want = np.array([
        clf.model.calc_same_diff_log_likelihood_ratio(
            u_model[i][None], u_model[j][None])
        for i, j in pairs
    ])
    got = ours.score_pairs(eval_x[pairs[:, 0]], eval_x[pairs[:, 1]])
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / scale) < 1e-8

    # ---- protocol EER equality ------------------------------------------
    eer_pkg, _ = eer_from_scores(labels, want)
    eer_ours, _ = eer_from_scores(labels, got)
    assert eer_pkg == eer_ours
