"""Serving API: SpeakerVerifier enroll/verify/identify/calibrate semantics."""

import os

import numpy as np
import pytest

from deeplip_tpu.data.audio_io import read_wav
from deeplip_tpu.data.manifest import SpeakerManifest
from deeplip_tpu.data.synthetic import make_audio_corpus, make_trial_list
from tests.test_cli import _write_audio_config


@pytest.fixture(scope="module")
def verifier(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    make_audio_corpus(root, n_spk=3, utts_per_spk=3, duration=1.0)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = os.path.join(root, "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=40)
    cfg_path = os.path.join(root, "audio.yaml")
    _write_audio_config(cfg_path, root, trial_path)

    from deeplip_tpu.serve import SpeakerVerifier

    v = SpeakerVerifier(cfg_path, exp_root=os.path.join(root, "exp"))
    utts = {f"spk{i}": [u.path for u in spk_utts]
            for i, spk_utts in enumerate(manifest.speakers)}
    return v, utts, trial_path, root


def test_embed_files_matches_embed_pcm(verifier):
    v, utts, _, _ = verifier
    path = next(iter(utts.values()))[0]
    e_file = v.embed_files({"u": path})["u"]
    pcm, sr = read_wav(path)
    e_pcm = v.embed_pcm({"u": pcm}, rate=sr)["u"]
    # r5: embed_files resolves transport='auto' → int16 on this PCM16
    # corpus; the model sees IDENTICAL float32 PCM (value-exact rescale)
    # but the extra convert op fuses differently, so agreement is f32
    # roundoff, not bit-equality (same bar as
    # test_int16_transport_bit_equal)
    np.testing.assert_allclose(e_file, e_pcm, atol=1e-6, rtol=0)
    # LMCL-path embeddings come out unit-norm (train_audio.py:318-320)
    assert abs(float(np.linalg.norm(e_file)) - 1.0) < 1e-5


def test_enroll_score_identify(verifier):
    v, utts, _, _ = verifier
    speakers = list(utts)
    for s in speakers:
        v.enroll(s, utts[s][0])
    # single-utterance profile == that utterance's embedding -> score 1.0
    s0 = speakers[0]
    assert v.score(s0, utts[s0][0]) == pytest.approx(1.0, abs=1e-5)
    top = v.identify(utts[s0][0], top_k=len(speakers))
    assert top[0][0] == s0
    assert top[0][1] == pytest.approx(1.0, abs=1e-5)
    assert len(top) == len(speakers)
    # multi-utterance enrollment: normalized mean of unit embeddings
    e0 = v.profiles[s0].copy()
    v.enroll(s0, utts[s0][:2])
    assert not np.array_equal(v.profiles[s0], e0)
    assert abs(float(np.linalg.norm(v.profiles[s0])) - 1.0) < 1e-6

    with pytest.raises(KeyError):
        v.score("nobody", utts[s0][0])


def test_calibrate_sets_threshold_and_verify(verifier):
    v, utts, trial_path, root = verifier
    eer, thr = v.calibrate(trial_path, root)
    assert 0.0 <= eer <= 1.0
    assert v.threshold == thr
    s0 = next(iter(utts))
    v.enroll(s0, utts[s0][0])
    r = v.verify(s0, utts[s0][0])
    assert r.threshold == thr and r.speaker == s0
    assert r.accept == (r.score >= thr)
    # the enrolled utterance itself scores 1.0 -> must accept
    assert r.accept


def test_verify_without_threshold_raises(tmp_path):
    from deeplip_tpu.serve import SpeakerVerifier

    root = str(tmp_path)
    make_audio_corpus(root, n_spk=2, utts_per_spk=1, duration=0.6)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = os.path.join(root, "t.txt")
    make_trial_list(trial_path, manifest, n_trials=4)
    cfg_path = os.path.join(root, "audio.yaml")
    _write_audio_config(cfg_path, root, trial_path)
    v = SpeakerVerifier(cfg_path, exp_root=os.path.join(root, "exp"))
    path = manifest.speakers[0][0].path
    v.enroll("s", path)
    with pytest.raises(ValueError):
        v.verify("s", path)


def test_profiles_save_load_roundtrip(verifier, tmp_path):
    v, utts, _, _ = verifier
    for s in utts:
        v.enroll(s, utts[s][0])
    out = str(tmp_path / "profiles")
    v.save_profiles(out)

    from deeplip_tpu.serve import SpeakerVerifier

    v2 = SpeakerVerifier.__new__(SpeakerVerifier)  # skip model build: only
    v2.profiles = {}                               # profile IO under test
    v2.load_profiles(out)
    assert set(v2.profiles) == set(v.profiles)
    for s in v.profiles:
        np.testing.assert_allclose(v2.profiles[s], v.profiles[s], atol=1e-7)


def test_cohort_asnorm_scoring(verifier):
    v, utts, trial_path, root = verifier
    saved_thr, saved_cohort = v.threshold, v.cohort
    try:
        speakers = list(utts)
        for s in speakers:
            v.enroll(s, utts[s][0])
        s0 = speakers[0]
        probe = utts[s0][1]
        raw = v.score(s0, probe)

        # cohort = the other speakers' utterances, embedded with this model
        impostors = [p for s in speakers[1:] for p in utts[s]]
        v.set_cohort_files(impostors, top_k=4)
        assert v.cohort is not None and v.cohort.shape[0] == len(impostors)
        # switching scoring scales invalidates any raw-scale threshold
        assert v.threshold is None
        with pytest.raises(ValueError, match="no operating threshold"):
            v.verify(s0, probe)
        normed = v.score(s0, probe)
        assert normed != raw  # scores now live on the cohort-normalized scale

        # matches the eval back-end formula: exactly vs the host twin
        # (batch-1 serving routes there), to f32 roundoff vs the device
        # back-end (different accumulation order on O(1-10) z-scores)
        from deeplip_tpu.eval.snorm import (asnorm_trial_scores,
                                            asnorm_trial_scores_np)

        e = np.stack([v.profiles[s0],
                      v._embed_one(probe) / np.linalg.norm(v._embed_one(probe))])
        expect_np = asnorm_trial_scores_np(
            e, np.asarray([[0, 1]]), v.cohort, top_k=4)
        assert normed == pytest.approx(float(expect_np[0]), abs=1e-6)
        expect_dev = asnorm_trial_scores(
            e, np.asarray([[0, 1]]), v.cohort, top_k=4)
        assert normed == pytest.approx(float(expect_dev[0]), abs=5e-5)

        # identify ranks on the same normalized scale (the winner may differ
        # from raw cosine — per-profile cohort stats shift scores, and this
        # net is random-init — but s0's entry must equal score())
        top = v.identify(probe, top_k=len(speakers))
        assert len(top) == len(speakers)
        assert top[0][1] >= top[-1][1]
        assert dict(top)[s0] == pytest.approx(normed, abs=1e-6)

        # calibrate under the cohort: threshold lands on the normalized
        # scale (same scale verify() compares against)
        eer, thr = v.calibrate(trial_path, root)
        assert np.isfinite(thr) and 0.0 <= eer <= 1.0
        r = v.verify(s0, probe)
        assert r.threshold == thr and r.score == pytest.approx(normed, abs=1e-6)

        # cohort off -> raw cosine again
        v.set_cohort(None)
        assert v.score(s0, probe) == pytest.approx(raw, abs=1e-6)
    finally:
        v.threshold, v.cohort = saved_thr, saved_cohort


def test_pair_scores_host_fallback_matches_device():
    """Batch-1 serving scores run on the host numpy twins below the
    host_score_macs cutoff (zero device dispatches); forcing the device
    back-end (cutoff 0) must give the same scores to f32 roundoff, raw
    and AS-normed, and the cutoff must route large jobs to the device."""
    from unittest import mock

    from deeplip_tpu.serve.verifier import ProfileVerifier

    rng = np.random.default_rng(9)
    emb = rng.standard_normal((6, 32)).astype(np.float32)
    pairs = np.asarray([[0, 1], [2, 3], [4, 5]], np.int32)

    v = ProfileVerifier()
    v_dev = ProfileVerifier()
    v_dev.host_score_macs = 0
    for cohort in (None, rng.standard_normal((20, 32)).astype(np.float32)):
        if cohort is not None:
            v.set_cohort(cohort, top_k=8)
            v_dev.set_cohort(cohort, top_k=8)
        host = v._pair_scores(emb, pairs)
        dev = v_dev._pair_scores(emb, pairs)
        np.testing.assert_allclose(host, dev, rtol=0, atol=2e-6)

    # routing: small job takes the numpy twin, huge cutoff-exceeding job
    # takes the jitted path
    with mock.patch("deeplip_tpu.eval.scoring.cosine_scores_np",
                    wraps=__import__("deeplip_tpu.eval.scoring",
                                     fromlist=["x"]).cosine_scores_np) as m:
        v.set_cohort(None)
        v._pair_scores(emb, pairs)
        assert m.called
    v.host_score_macs = 1  # nothing is small enough now
    with mock.patch("deeplip_tpu.eval.scoring.cosine_scores_np") as m:
        v._pair_scores(emb, pairs)
        assert not m.called


def test_microbatcher_matches_direct_calls(verifier):
    """Batched decisions are the direct calls' decisions: same embeddings
    (padded batch rows == batch-1 extraction), same scoring code."""
    from deeplip_tpu.serve import MicroBatcher

    v, utts, _, _ = verifier
    speakers = list(utts)
    for s in speakers:
        v.enroll(s, utts[s][0])
    v.threshold = 0.5
    s0 = speakers[0]
    probe = utts[s0][1]

    with MicroBatcher(v, max_batch=8, max_wait_ms=0) as mb:
        e_direct = np.asarray(v._embed_one(probe))
        e_batched = mb.embed(probe)
        np.testing.assert_allclose(e_batched, e_direct, atol=1e-6, rtol=0)

        assert mb.score(s0, probe) == pytest.approx(v.score(s0, probe),
                                                    abs=1e-6)
        r_mb, r_direct = mb.verify(s0, probe), v.verify(s0, probe)
        assert r_mb.accept == r_direct.accept
        assert r_mb.score == pytest.approx(r_direct.score, abs=1e-6)
        assert r_mb.threshold == r_direct.threshold

        top_mb = mb.identify(probe, top_k=len(speakers))
        top_direct = v.identify(probe, top_k=len(speakers))
        assert [n for n, _ in top_mb] == [n for n, _ in top_direct]

        # enroll through the batcher: same profile as ProfileVerifier.enroll
        v.enroll("mb_ref", utts[s0][:2])
        ref_profile = v.profiles.pop("mb_ref")
        got = mb.enroll("mb_spk", utts[s0][:2])
        np.testing.assert_allclose(got, ref_profile, atol=1e-6, rtol=0)
        assert "mb_spk" in v.profiles

        # str paths accepted (decoded at submit time)
        assert mb.score(s0, utts[s0][0]) == pytest.approx(1.0, abs=1e-5)


def test_microbatcher_coalesces_concurrent_requests(verifier):
    """Concurrent callers inside one wait window share ONE embedding
    dispatch, row counts are padded to powers of two, and every caller
    still gets its own correct answer."""
    from concurrent.futures import ThreadPoolExecutor

    from deeplip_tpu.serve import MicroBatcher

    v, utts, _, _ = verifier
    speakers = list(utts)
    for s in speakers:
        v.enroll(s, utts[s][0])
    v.threshold = 0.5

    # 3 EQUAL-length probes (corpus wavs have randomized durations and could
    # land in different length buckets, where 1+2 rows are already pow2)
    rng = np.random.default_rng(3)
    probes = [(0.1 * rng.standard_normal(16000)).astype(np.float32)
              for _ in speakers]
    expect = [v.score(s, p) for s, p in zip(speakers, probes)]

    mb = MicroBatcher(v, max_batch=8, max_wait_ms=500)
    try:
        with ThreadPoolExecutor(max_workers=3) as pool:
            got = list(pool.map(
                lambda sp: mb.score(sp[0], sp[1]), zip(speakers, probes)))
        for g, e in zip(got, expect):
            assert g == pytest.approx(e, abs=1e-6)
        # the 500 ms window coalesced all 3 into one dispatch; pow2 row
        # padding made the 3 equal-length rows a 4-row batch
        assert mb.n_batches == 1 and mb.n_requests == 3
        assert mb.n_slots == 4 and mb.n_pad_slots == 1
        assert mb.mean_batch_slots == 3.0
    finally:
        mb.close()


def test_microbatcher_errors_and_close(verifier):
    from deeplip_tpu.serve import MicroBatcher

    v, utts, _, _ = verifier
    probe = next(iter(utts.values()))[0]
    saved_thr = v.threshold
    mb = MicroBatcher(v, max_batch=4, max_wait_ms=0)
    try:
        # per-request failures propagate to that caller only
        with pytest.raises(KeyError):
            mb.score("nobody", probe)
        v.threshold = None
        with pytest.raises(ValueError, match="no operating threshold"):
            mb.verify(next(iter(utts)), probe)
        # the batcher survives failed requests
        e = mb.embed(probe)
        assert e.ndim == 1 and np.all(np.isfinite(e))
    finally:
        v.threshold = saved_thr
        mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.embed(probe)


def _make_av_setup(tmp_path):
    import yaml as _yaml

    root = str(tmp_path / "corpus")
    make_audio_corpus(root, n_spk=2, utts_per_spk=2, duration=0.8)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = str(tmp_path / "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=8)
    vroot = str(tmp_path / "video")
    rng = np.random.default_rng(0)
    clip_paths = {}
    for s, spk in enumerate(manifest.speakers):
        os.makedirs(os.path.join(vroot, f"s{s:02d}"), exist_ok=True)
        for u in spk:
            stem = os.path.splitext(os.path.basename(u.path))[0]
            cp = os.path.join(vroot, f"s{s:02d}", stem + ".npz")
            np.savez(cp, data=rng.integers(0, 255, (4, 96, 96)).astype(np.uint8))
            clip_paths[u.path] = cp
    cfg = {
        "data": {
            "frames": [30, 40],
            "train_manifest": os.path.join(root, "manifest.csv"),
            "video_root": vroot, "test_root": root, "trial_grid": trial_path,
            "python_data_config": {
                "rate": 16000, "feat_type": "mfcc",
                "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                         "energy": True, "normalize": True, "delta": False,
                         "win_len": 0.025, "win_shift": 0.01}},
        },
        "model": {
            "audio_config": {"arch": "tdnn", "tdnn": {
                "input_dim": 24, "hidden_dim": [16, 32],
                "context": [[-2, -1, 0, 1, 2], [0]], "tdnn_layers": 2,
                "embedding_dim": 8, "pooling": "statistic",
                "attention_hidden_size": 4, "bn_first": True}},
            "video_config": {"arch": "tcn", "tcn": {
                "extract_feats": True, "backbone_type": "resnet",
                "width_mult": 1.0, "relu_type": "prelu", "tcn_num_layers": 1,
                "tcn_kernel_size": [3], "tcn_dropout": 0.2, "tcn_dwpw": False,
                "tcn_width_mult": 1}},
        },
        "train": {"optimizer": "sgd", "bs": 4, "lr_decay_step": [4, 8],
                  "lr_decay": 0.1, "epoch": 1, "loss": "CrossEntropy",
                  "max_clips": 1, "clip_frames": 4,
                  "sgd": {"init_lr": 0.5, "weight_decay": 1e-5,
                          "momentum": 0.9},
                  "resume": "None", "audio_config": {"resume": "None"},
                  "video_config": {"resume": "None"}},
        "test": {"eval_grid": True, "eval_lomgrid": False, "use_cos": True},
    }
    cfg_path = str(tmp_path / "fusion.yaml")
    _yaml.safe_dump(cfg, open(cfg_path, "w"))
    return cfg_path, manifest, trial_path, clip_paths


def test_av_verifier_end_to_end(tmp_path):
    from deeplip_tpu.serve import AVSpeakerVerifier

    cfg_path, manifest, trial_path, clip_paths = _make_av_setup(tmp_path)
    v = AVSpeakerVerifier(cfg_path, exp_root=str(tmp_path / "exp"),
                          log_time="av0")

    eer, thr = v.calibrate(trial_path)
    assert 0.0 <= eer <= 1.0 and v.threshold == thr

    items = {f"spk{s}": [(u.path, [clip_paths[u.path]]) for u in spk]
             for s, spk in enumerate(manifest.speakers)}
    for name, its in items.items():
        v.enroll(name, its[0])
    probe = items["spk0"][0]
    assert v.score("spk0", probe) == pytest.approx(1.0, abs=1e-5)
    r = v.verify("spk0", probe)
    assert r.accept and r.threshold == thr
    assert v.identify(probe)[0][0] == "spk0"

    # in-memory items (PCM + uint8 clip arrays) embed identically to paths
    wav_path, (cp,) = probe[0], tuple(probe[1:])[0]
    pcm, _sr = read_wav(wav_path)
    clip_arr = np.load(cp)["data"]
    e_path = v.embed_items({"x": (wav_path, [cp])})["x"]
    e_mem = v.embed_items({"x": (pcm, [clip_arr])})["x"]
    np.testing.assert_array_equal(e_path, e_mem)
