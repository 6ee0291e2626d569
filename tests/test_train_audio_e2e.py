"""End-to-end tiny-run: synthetic wav corpus → train → extract → EER.

This is the audio 'minimum slice' exit criterion of SURVEY.md §7.3: train an
audio model on GRID-style data, extract embeddings, score a trial list, get
an EER — plus loss-decrease and checkpoint-averaging checks. Runs on the
8-virtual-device CPU mesh, exercising the same sharded code path as TPU.
"""

import os

import numpy as np
import pytest

from deeplip_tpu.core.config import Config
from deeplip_tpu.core.mesh import make_mesh
from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
from deeplip_tpu.data.synthetic import make_audio_corpus, make_trial_list
from deeplip_tpu.eval.scoring import TrialList
from deeplip_tpu.train.audio import AudioTrainer

TINY_MODEL = {
    "arch": "tdnn",
    "tdnn": {
        "input_dim": 24,
        "hidden_dim": [48, 48, 48, 48, 96],
        "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [-3, 0, 3], [0], [0]],
        "tdnn_layers": 5,
        "embedding_dim": 32,
        "pooling": "statistic",
        "attention_hidden_size": 16,
        "bn_first": True,
    },
}


def _config(tmp_path, corpus_root):
    manifest = os.path.join(corpus_root, "manifest.csv")
    return Config(
        {
            "data": {
                "frames": [60, 100],
                "train_manifest": manifest,
                "python_data_config": {
                    "rate": 16000,
                    "feat_type": "mfcc",
                    "mfcc": {
                        "n_fft": 512,
                        "num_bin": 26,
                        "num_cep": 24,
                        "energy": True,
                        "normalize": True,
                        "delta": False,
                        "win_len": 0.025,
                        "win_shift": 0.01,
                    },
                },
            },
            "model": TINY_MODEL,
            "train": {
                "type": "sgd",
                "bs": 8,
                "lr_decay": 0.1,
                "lr_decay_step": [100],
                "epoch": 2,
                "loss": "LMCL",
                "scale": 30,
                "margin": [0.1, 0.2],
                "sgd": {"init_lr": 0.05, "weight_decay": 1e-5, "momentum": 0.9},
                "frame_buckets": 3,
                "loader_workers": 2,
                "log_every": 0,
            },
            "test": {},
        }
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_audio_corpus(root, n_spk=4, utts_per_spk=6, duration=3.0)
    from deeplip_tpu.data.manifest import SpeakerManifest

    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = os.path.join(root, "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=150)
    return root, manifest, trial_path


def test_audio_end_to_end(corpus, tmp_path):
    root, manifest, trial_path = corpus
    mesh = make_mesh()
    trainer = AudioTrainer(
        _config(tmp_path, root), mesh=mesh, exp_root=str(tmp_path / "exp"), log_time="t0"
    )
    assert trainer.n_spk == 4

    # --- train 2 epochs; loss must decrease on average -----------------
    state = trainer.train()
    import json

    metrics_path = os.path.join(trainer.exp_dir, "train_metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_path)]
    losses = [r["loss"] for r in records]
    assert len(losses) >= 8
    assert np.mean(losses[-4:]) < np.mean(losses[:4])

    # --- checkpoints exist; averaging works ----------------------------
    assert os.path.isdir(os.path.join(trainer.exp_dir, "net_1"))
    assert os.path.isdir(os.path.join(trainer.exp_dir, "net_2"))
    trainer.model_average(avg_num=2)
    assert os.path.isdir(os.path.join(trainer.exp_dir, "net_avg"))

    # --- extract + score ------------------------------------------------
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ]
    test_set = EvalUtteranceSet(utts, batch_size=8, bucket_frames=50, num_workers=2)
    store = trainer.extract_embeddings(test_set)
    assert len(store) == len(utts)
    eer, thr = trainer.evaluate(trial_path, store)
    # speakers are strongly separable by construction
    assert eer < 0.25, f"EER too high: {eer}"

    # --- resume restores epoch ------------------------------------------
    trainer2 = AudioTrainer(
        _config(tmp_path, root), mesh=mesh, exp_root=str(tmp_path / "exp"), log_time="t0"
    )
    trainer2.load(os.path.join(trainer.exp_dir, "net_2"))
    assert trainer2.current_epoch == 2


def test_padded_extraction_matches_single(corpus, tmp_path):
    """Bucketed/padded batched extraction == per-utterance extraction."""
    root, manifest, _ = corpus
    trainer = AudioTrainer(
        _config(tmp_path, root), mesh=make_mesh(), exp_root=str(tmp_path / "exp2"), log_time="t1"
    )
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ][:4]
    batched = trainer.extract_embeddings(
        EvalUtteranceSet(utts, batch_size=4, bucket_frames=100, num_workers=1)
    )
    single = trainer.extract_embeddings(
        EvalUtteranceSet(utts, batch_size=1, bucket_frames=1, num_workers=1)
    )
    for u in utts:
        np.testing.assert_allclose(batched[u.name], single[u.name], atol=5e-4)


def test_int16_transport_bit_equal(corpus, tmp_path):
    """PCM16 transport (half the H2D bytes) must reproduce float32-transport
    embeddings on a PCM16 corpus: round(y·32768) recovers the stored int16
    sample and the device's /32768.0 rescale is an exact power-of-two
    division, so the two paths feed the model identical float32 PCM. The
    compiled programs differ by one convert op that XLA fuses differently,
    so embeddings agree to f32 roundoff (measured ~1 ULP), not bit-equal."""
    root, manifest, _ = corpus
    trainer = AudioTrainer(
        _config(tmp_path, root), mesh=make_mesh(),
        exp_root=str(tmp_path / "exp_i16"), log_time="t1",
    )
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ][:6]
    kw = dict(batch_size=3, bucket_frames=50, num_workers=1)
    f32 = trainer.extract_embeddings(EvalUtteranceSet(utts, **kw))
    i16 = trainer.extract_embeddings(
        EvalUtteranceSet(utts, transport="int16", **kw))
    for u in utts:
        np.testing.assert_allclose(f32[u.name], i16[u.name], atol=1e-6, rtol=0)


def test_stft_bucketed_extraction_matches_exact(corpus, tmp_path):
    """r5 (VERDICT r4 #4): feat_type=stft embeddings from the default
    bucketed/padded extractor must match exact-length per-utterance
    extraction — the masked reflect framing + the librosa-convention
    valid-frame count (1 + L//hop) make the padded batch see exactly the
    reference's frames. Before r5 the tail frames saw batch-pad zeros
    (documented deviation, now closed)."""
    import dataclasses

    import jax.numpy as jnp

    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.ops import features as F

    root, manifest, _ = corpus
    cfg = _config(tmp_path, root)
    cfg["data"]["python_data_config"] = {
        "rate": 16000,
        "feat_type": "stft",
        "stft": {"n_fft": 512, "normalize": True, "delta": False,
                 "win_len": 0.025, "win_shift": 0.01},
    }
    cfg["model"] = dict(TINY_MODEL)
    cfg["model"]["tdnn"] = dict(TINY_MODEL["tdnn"], input_dim=257)
    trainer = AudioTrainer(cfg, mesh=make_mesh(),
                           exp_root=str(tmp_path / "exp_stft"), log_time="t1")
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ][:5]
    # truncate to ragged lengths so the padded buckets really pad
    raggeds = {}
    for i, u in enumerate(utts):
        y, _sr = read_wav(u.path)
        n = len(y) - (i * 1777) % 7000
        raggeds[u.name] = y[:n].astype(np.float32)
        p = str(tmp_path / f"rag{i}.wav")
        from deeplip_tpu.data.audio_io import write_wav

        write_wav(p, raggeds[u.name], 16000)
        utts[i] = EvalUtterance(u.name, p)
        y2, _ = read_wav(p)
        raggeds[u.name] = y2.astype(np.float32)  # PCM16 round-trip values

    store = trainer.extract_embeddings(
        EvalUtteranceSet(utts, batch_size=4, bucket_frames=100, num_workers=1))

    # exact-length per-utterance reference through the same jitted embed
    state = trainer.ensure_state()
    embed = trainer._embed_fns["embed"]
    hop = int(trainer.feat_cfg.rate * trainer.feat_cfg.win_shift)
    for u in utts:
        y = raggeds[u.name]
        t = 1 + len(y) // hop
        ref = np.asarray(embed(
            state.params, state.batch_stats, jnp.asarray(y[None]),
            jnp.asarray([t], jnp.int32), jnp.asarray([len(y)], jnp.int32),
        ))[0]
        np.testing.assert_allclose(store[u.name], ref, atol=2e-5, rtol=0)


def _write_float32_wav(path, data, rate):
    """IEEE-float32 (fmt tag 3) WAV — the librosa/soundfile output format."""
    import struct

    pcm = np.asarray(data, "<f4").tobytes()
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_auto_transport_resolution(corpus, tmp_path):
    """``transport="auto"`` (the eval_set_kwargs default, r5) must resolve
    to int16 iff EVERY utterance is an integer-PCM16 wav already at the
    target rate (where quantized transport is value-exact), and fall back
    to float32 when any utterance is IEEE-float or needs resampling."""
    root, manifest, _ = corpus
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ][:4]

    def resolve(utt_list):
        es = EvalUtteranceSet(utt_list, batch_size=2, bucket_frames=50,
                              num_workers=1, transport="auto")
        dtypes = {b["pcm"].dtype.name for b in es.batches()}
        return es._resolved_transport, dtypes

    res, dtypes = resolve(utts)
    assert res == "int16" and dtypes == {"int16"}

    # one IEEE-float32 wav in the corpus → the whole sweep ships float32
    # (round-tripping its samples through int16 would NOT be value-exact)
    rng = np.random.default_rng(0)
    fp = str(tmp_path / "ieee_float.wav")
    _write_float32_wav(fp, rng.standard_normal(4000).astype(np.float32) * 0.1,
                       16000)
    res, dtypes = resolve(utts + [EvalUtterance("f32", fp)])
    assert res == "float32" and dtypes == {"float32"}

    # a wrong-rate wav (resampled leg) likewise forces float32
    from deeplip_tpu.data.audio_io import write_wav

    wp = str(tmp_path / "rate8k.wav")
    write_wav(wp, rng.standard_normal(1600).astype(np.float32) * 0.1, 8000)
    res, dtypes = resolve(utts + [EvalUtterance("r8k", wp)])
    assert res == "float32" and dtypes == {"float32"}

    # a CUSTOM reader (may transform samples — here: a gain) must resolve
    # to float32 even over an all-PCM16 corpus: quantizing transformed
    # floats would not be value-exact (r5 self-review fix)
    from deeplip_tpu.data.audio_io import read_wav

    def gain_reader(path):
        y, sr = read_wav(path)
        return y * 0.5, sr

    es = EvalUtteranceSet(utts, batch_size=2, bucket_frames=50,
                          num_workers=1, transport="auto",
                          reader=gain_reader)
    batches = list(es.batches())
    assert es._resolved_transport == "float32"
    assert {b["pcm"].dtype.name for b in batches} == {"float32"}


def test_eval_set_kwargs_defaults():
    """r5 (VERDICT r4 #3): the measured eval wins are the shipped defaults —
    adaptive DP-optimal buckets (n_buckets=8) and value-exact-when-possible
    int16 transport ('auto') — with explicit config opt-outs."""
    from deeplip_tpu.data.audio_pipeline import eval_set_kwargs
    from deeplip_tpu.ops.features import FeatureConfig

    cfg = FeatureConfig()
    kw = eval_set_kwargs(cfg, {})
    assert kw["transport"] == "auto" and kw["n_buckets"] == 8

    kw = eval_set_kwargs(cfg, {"n_buckets": 0, "transport": "float32"})
    assert "n_buckets" not in kw and kw["transport"] == "float32"

    kw = eval_set_kwargs(cfg, {"n_buckets": None, "transport": "int16"})
    assert kw["n_buckets"] == 8 and kw["transport"] == "int16"


def test_attentive_pooling_trainer_path(corpus, tmp_path):
    """Train a few steps with attentive-statistics pooling via the trainer."""
    import copy

    import jax
    import jax.numpy as jnp

    from deeplip_tpu.core.mesh import data_sharding
    from deeplip_tpu.ops.framing import samples_for_frames

    root, manifest, _ = corpus
    cfg = _config(tmp_path, root)
    cfg.model.tdnn["pooling"] = "attentive_statistic"
    trainer = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "expA"),
                           log_time="att")
    rng = np.random.default_rng(0)
    samples = samples_for_frames(50, 0.025, 0.01, 16000)
    pcm = jax.device_put(rng.standard_normal((8, samples)).astype(np.float32),
                         data_sharding(trainer.mesh, 2))
    labels = jax.device_put(rng.integers(0, 4, 8).astype(np.int64),
                            data_sharding(trainer.mesh, 1))
    state = trainer.ensure_state()
    state, metrics = trainer._train_step(state, pcm, labels, jnp.float32(0.2))
    assert np.isfinite(float(metrics["loss"]))


def test_optimal_bucket_edges_matches_bruteforce():
    """DP bucket-edge selection equals exhaustive search on small cases and
    satisfies the structural properties (top edge = max length, every
    length covered, cost monotone non-increasing in n_buckets)."""
    from itertools import combinations

    from deeplip_tpu.data.audio_pipeline import optimal_bucket_edges

    rng = np.random.default_rng(7)

    def pad_cost(lengths, edges):
        e = np.sort(np.asarray(edges))
        tops = e[np.searchsorted(e, lengths, side="left")]
        return int(np.sum(tops - lengths))

    for trial in range(5):
        lengths = rng.integers(50, 120, size=30)
        u = np.unique(lengths)
        for k in (1, 2, 3):
            got = optimal_bucket_edges(lengths, k)
            assert got[-1] == int(u.max())
            assert all(any(e >= t for e in got) for t in lengths)
            if len(u) <= k:
                assert got == [int(x) for x in u]
                continue
            # brute force: the top edge must be max(u); choose k-1 others
            best = min(
                pad_cost(lengths, list(c) + [int(u.max())])
                for c in combinations([int(x) for x in u[:-1]], k - 1)
            )
            assert pad_cost(lengths, got) == best, (k, got)
    # monotone in k
    lengths = rng.integers(100, 300, size=200)
    costs = [pad_cost(lengths, optimal_bucket_edges(lengths, k))
             for k in (1, 2, 4, 8, 16)]
    assert costs == sorted(costs, reverse=True)


def test_eval_set_adaptive_buckets_match_fixed(corpus, tmp_path):
    """n_buckets (DP-optimal adaptive edges) must reproduce the fixed
    bucket_frames path's embeddings exactly at the masked-pooling level
    (VALID convs + masked stats make padded batches equal unpadded), while
    padding strictly fewer frames."""
    root, manifest, _ = corpus
    trainer = AudioTrainer(
        _config(tmp_path, root), mesh=make_mesh(),
        exp_root=str(tmp_path / "exp_nb"), log_time="t1",
    )
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ][:6]
    fixed_set = EvalUtteranceSet(utts, batch_size=3, bucket_frames=100,
                                 num_workers=1)
    adapt_set = EvalUtteranceSet(utts, batch_size=3, bucket_frames=100,
                                 n_buckets=2, num_workers=1)

    from deeplip_tpu.ops.framing import num_frames

    def pad_frames(es):
        total = 0
        for b in es.batches():
            bucket_t = num_frames(b["pcm"].shape[1], es.frame_len, es.frame_step)
            total += int(b["pcm"].shape[0] * bucket_t - b["feat_lengths"].sum())
        return total

    # adaptive edges sit at actual corpus lengths -> no more pad than the
    # 100-frame quantization on this short-utterance corpus
    assert pad_frames(adapt_set) <= pad_frames(fixed_set)
    fixed = trainer.extract_embeddings(fixed_set)
    adapt = trainer.extract_embeddings(adapt_set)
    for u in utts:
        np.testing.assert_allclose(fixed[u.name], adapt[u.name], atol=5e-4)


def test_eval_set_resampled_length_exact(tmp_path):
    """Round-2 regression (ROADMAP item): the header-based length estimate
    for files needing resampling must match resample_poly's actual output
    EXACTLY — the truncating estimate was ±1 sample (potentially one feature
    frame) off on the GRID 44.1 kHz path
    (reference semantics: datasets.py:399-464 via librosa.resample)."""
    from deeplip_tpu.data.audio_io import read_wav, resample, write_wav
    from deeplip_tpu.ops.framing import num_frames

    rng = np.random.default_rng(5)
    utts = []
    # awkward sample counts: n*160/441 non-integral for 44.1k; plus 22.05k
    for i, (rate, n) in enumerate(
        [(44100, 132301), (44100, 131777), (22050, 44101), (16000, 12345)]
    ):
        p = str(tmp_path / f"u{i}_{rate}.wav")
        write_wav(p, (rng.standard_normal(n) * 0.1).astype(np.float32), rate)
        utts.append(EvalUtterance(name=f"u{i}", path=p))

    es = EvalUtteranceSet(utts, rate=16000, batch_size=2, bucket_frames=10,
                          num_workers=1)
    for utt in utts:
        _, n_est, _ = es._utt_samples(utt)
        y, sr = read_wav(utt.path)
        y16 = resample(y, sr, 16000)
        assert n_est == len(y16), (utt.path, n_est, len(y16))

    # feat_lengths in the emitted batches match the true frame counts
    true_frames = {}
    for utt in utts:
        y, sr = read_wav(utt.path)
        y16 = resample(y, sr, 16000)
        true_frames[utt.name] = num_frames(len(y16), es.frame_len, es.frame_step)
    for batch in es.batches():
        for name, t in zip(batch["names"], batch["feat_lengths"]):
            assert int(t) == true_frames[name], (name, int(t), true_frames[name])


def test_audio_grouped_stepping_matches_single(corpus, tmp_path):
    """_train_step_group (lax.scan over K stacked batches) == K single
    _train_step dispatches: the audio step consumes no RNG, so losses and
    SGD params must agree to float-fusion noise. Also trains one epoch
    through the grouped loop (bucket_run sampler + flush logic)."""
    import jax
    import jax.numpy as jnp

    corpus_root, _manifest, _trials = corpus
    cfg = _config(tmp_path, corpus_root)

    ta = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "expA"))
    batches = [b for _, b in zip(range(2), ta.pipeline.epoch(0))]
    # force a shared shape so the pair is groupable
    if batches[0]["pcm"].shape != batches[1]["pcm"].shape:
        batches[1] = dict(batches[1], pcm=batches[0]["pcm"].copy(),
                          labels=batches[1]["labels"],
                          n_frames=batches[0]["n_frames"])
    margin = jnp.float32(0.1)

    state_a = ta.ensure_state()
    losses_a = []
    for b in batches:
        state_a, m = ta._train_step(state_a, b["pcm"], b["labels"], margin)
        losses_a.append(float(m["loss"]))

    tb = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "expB"))
    state_b = tb.ensure_state()
    state_b, m = tb._train_step_group(
        state_b,
        np.stack([b["pcm"] for b in batches]),
        np.stack([b["labels"] for b in batches]),
        margin,
    )
    losses_b = [float(x) for x in np.asarray(m["loss"])]
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5)
    # SGD+momentum has no adaptive normalization, so params stay tight
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)

    # grouped epoch loop end-to-end (sampler bucket_run, flush, logging)
    cfg2 = _config(tmp_path, corpus_root)
    cfg2.train["steps_per_dispatch"] = 2
    tc = AudioTrainer(cfg2, mesh=make_mesh(), exp_root=str(tmp_path / "expC"))
    assert tc.pipeline.sampler.bucket_run == 2
    state_c = tc.train(epochs=1)
    assert np.isfinite(
        float(np.sum(np.asarray(jax.tree_util.tree_leaves(state_c.params)[0]))))


def test_group_batches_generator_edges():
    """Shape changes and kaldi batches flush runs; partial tails come out
    as individual batches (no per-tail-size compile shapes)."""
    from deeplip_tpu.train.audio import _group_batches

    def b(shape, tag):
        return {"pcm": np.zeros(shape, np.float32),
                "labels": np.zeros((shape[0],), np.int64),
                "n_frames": shape[1] // 160, "tag": tag}

    src = [
        b((4, 320), 0), b((4, 320), 1),            # full group of 2
        b((4, 480), 2),                            # shape change, lone tail
        {"feats": np.zeros((4, 3, 24)), "labels": np.zeros(4), "n_frames": 3},
        b((4, 320), 3), b((4, 320), 4), b((4, 320), 5),  # group + tail
    ]
    out = list(_group_batches(iter(src), 2))
    kinds = [("group", o["group"]) if "group" in o
             else ("feats" if "feats" in o else "single") for o in out]
    assert kinds == [("group", 2), "single", "feats",
                     ("group", 2), "single"]
    # grouped pcm stacking preserves order
    assert out[0]["pcm"].shape == (2, 4, 320)
    assert out[3]["labels"].shape == (2, 4)
    # k=1 passes everything through untouched
    thru = list(_group_batches(iter(src), 1))
    assert all("group" not in o for o in thru) and len(thru) == len(src)


def test_finetune_loads_backbone_only_different_n_spk(corpus, tmp_path):
    """load_finetune must restore the BACKBONE only (reference
    train_audio.py:276-296): finetuning onto a different speaker count keeps
    the fresh classifier instead of crashing on shape mismatch."""
    import jax

    corpus_root, _m, _t = corpus
    cfg = _config(tmp_path, corpus_root)
    ta = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "ftA"),
                      log_time="ft0")
    ta.ensure_state()
    ta.current_epoch = 1
    ta.save(1)
    from deeplip_tpu.train import checkpoint as ckpt
    ckpt.wait_for_saves()

    cfg2 = _config(tmp_path, corpus_root)
    cfg2.train["train_type"] = "finetune"
    tb = AudioTrainer(cfg2, mesh=make_mesh(), n_spk=7,
                      exp_root=str(tmp_path / "ftB"))
    tb.load_finetune(os.path.join(ta.exp_dir, "net_1"))
    crit = tb.state.params["criterion"]
    w = jax.tree_util.tree_leaves(crit)[0]
    assert 7 in w.shape  # fresh classifier for the new speaker count
    # backbone actually restored
    a0 = jax.tree_util.tree_leaves(ta.state.params["model"])[0]
    b0 = jax.tree_util.tree_leaves(tb.state.params["model"])[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))


def test_resume_fast_forwards_lr_schedule(corpus, tmp_path):
    """Resuming without optimizer state must fast-forward the step-based
    MultiStep schedule: a crash resume past a decay milestone would
    otherwise train at the undecayed init LR."""
    corpus_root, _m, _t = corpus
    cfg = _config(tmp_path, corpus_root)
    cfg.train["lr_decay_step"] = [1]  # decay 10x after epoch 1
    ta = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "rsA"),
                      log_time="rs0")
    ta.ensure_state()
    ta.current_epoch = 2
    ta.save(2)
    from deeplip_tpu.train import checkpoint as ckpt
    ckpt.wait_for_saves()

    cfg2 = _config(tmp_path, corpus_root)
    cfg2.train["lr_decay_step"] = [1]
    tb = AudioTrainer(cfg2, mesh=make_mesh(), exp_root=str(tmp_path / "rsB"))
    tb.load(os.path.join(ta.exp_dir, "net_2"))
    assert int(tb.state.step) > 0
    lr_resumed = float(tb.schedule(int(tb.state.step)))
    lr_init = float(tb.schedule(0))
    assert lr_resumed < lr_init  # past the milestone -> decayed


def test_train_transport_int16_auto_bit_equal(corpus, tmp_path):
    """r5: the train pipeline's transport='auto' resolves to int16 on a
    PCM16 corpus (half the H2D bytes) and the jitted step sees BIT-IDENTICAL
    float32 PCM — round(y*32768) recovers the stored sample and i/32768.0
    is an exact power-of-two rescale — so losses and params match the
    forced-float32 transport exactly. Custom readers resolve to float32."""
    import jax
    import jax.numpy as jnp

    corpus_root, manifest, _t = corpus

    cfg_a = _config(tmp_path, corpus_root)  # train.transport default: auto
    ta = AudioTrainer(cfg_a, mesh=make_mesh(), exp_root=str(tmp_path / "i16A"))
    batches_a = [b for _, b in zip(range(2), ta.pipeline.epoch(0))]
    assert ta.pipeline._resolve_transport() == "int16"
    assert all(b["pcm"].dtype == np.int16 for b in batches_a)

    cfg_b = _config(tmp_path, corpus_root)
    cfg_b.train["transport"] = "float32"  # explicit opt-out
    tb = AudioTrainer(cfg_b, mesh=make_mesh(), exp_root=str(tmp_path / "i16B"))
    batches_b = [b for _, b in zip(range(2), tb.pipeline.epoch(0))]
    assert all(b["pcm"].dtype == np.float32 for b in batches_b)

    # identical sampling schedule -> identical crops up to the transport
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_array_equal(
            a["pcm"].astype(np.float32) / 32768.0, b["pcm"])

    margin = jnp.float32(0.1)
    state_a = ta.ensure_state()
    state_b = tb.ensure_state()
    for a, b in zip(batches_a, batches_b):
        state_a, ma = ta._train_step(state_a, a["pcm"], a["labels"], margin)
        state_b, mb = tb._train_step(state_b, b["pcm"], b["labels"], margin)
    # the rescale is exact, so the whole step is the same f32 program on the
    # same f32 values; XLA fuses the convert op differently though, which
    # reorders accumulations — loss agrees to f32 roundoff and params to a
    # few ULP after two LMCL-gradient SGD steps (measured max 2.0e-6)
    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=0, atol=5e-6)

    # a custom reader is opaque to the header probe -> conservative float32
    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.data.audio_pipeline import AudioTrainPipeline

    custom = AudioTrainPipeline(
        manifest, 4, frame_range=(60, 100),
        reader=lambda p, start=0, stop=None: read_wav(p, start=start, stop=stop),
        transport="auto")
    assert custom._resolve_transport() == "float32"
