"""Kaldi-format training path: ark/scp features -> speaker-balanced steps."""

import os

import numpy as np

from deeplip_tpu.core.config import Config
from deeplip_tpu.core.mesh import make_mesh
from deeplip_tpu.interop.kaldi import write_ark_scp
from deeplip_tpu.train.audio import AudioTrainer


def _make_kaldi_corpus(tmp_path, n_spk=3, utts=3, dim=24):
    rng = np.random.default_rng(0)
    utt2feat = {}
    spk2utt_lines = []
    for s in range(n_spk):
        names = []
        for u in range(utts):
            name = f"spk{s}_utt{u}"
            t = rng.integers(80, 140)
            # speaker-colored features
            utt2feat[name] = (
                rng.standard_normal((t, dim)) + 2.0 * np.sin(np.arange(dim) * (s + 1))
            ).astype(np.float32)
            names.append(name)
        spk2utt_lines.append(f"spk{s} " + " ".join(names))
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark_scp(utt2feat, ark, scp)
    spk2utt = str(tmp_path / "spk2utt")
    open(spk2utt, "w").write("\n".join(spk2utt_lines) + "\n")
    return spk2utt, scp


def test_kaldi_train_pipeline_and_steps(tmp_path):
    spk2utt, scp = _make_kaldi_corpus(tmp_path)
    cfg = Config(
        {
            "data": {
                "frames": [40, 60],
                "data_format": "kaldi",
                "kaldi_data_config": {
                    "trainset": {"nn_spk2utt": spk2utt, "nn_feat_scp": scp}
                },
                "python_data_config": {
                    "rate": 16000,
                    "feat_type": "mfcc",
                    "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                             "energy": True, "normalize": True, "delta": False,
                             "win_len": 0.025, "win_shift": 0.01},
                },
            },
            "model": {
                "arch": "tdnn",
                "tdnn": {
                    "input_dim": 24, "hidden_dim": [32, 32, 64],
                    "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]],
                    "tdnn_layers": 3, "embedding_dim": 16,
                    "pooling": "statistic", "attention_hidden_size": 8,
                    "bn_first": True,
                },
            },
            "train": {
                "type": "sgd", "bs": 8, "lr_decay": 0.1, "lr_decay_step": [50],
                "epoch": 1, "loss": "LMCL", "scale": 30, "margin": [0.2, 0.2],
                "frame_buckets": 2, "log_every": 0,
                "sgd": {"init_lr": 0.05, "weight_decay": 0, "momentum": 0.9},
            },
            "test": {},
        }
    )
    trainer = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "exp"),
                           log_time="k0")
    assert trainer.n_spk == 3
    assert trainer.pipeline is trainer._kaldi_pipeline
    state = trainer.train(epochs=1)
    assert os.path.isdir(os.path.join(trainer.exp_dir, "net_1"))
    records = open(os.path.join(trainer.exp_dir, "train_metrics.jsonl")).readlines()
    assert len(records) >= 1


def test_triplet_loss_training_branch(tmp_path):
    """The reference's Triplet loss option trains end-to-end."""
    import jax.numpy as jnp

    from deeplip_tpu.data.synthetic import make_audio_corpus
    from deeplip_tpu.ops.framing import samples_for_frames

    root = str(tmp_path / "c")
    make_audio_corpus(root, n_spk=3, utts_per_spk=2, duration=1.0)
    cfg = Config(
        {
            "data": {"frames": [30, 40],
                     "train_manifest": os.path.join(root, "manifest.csv"),
                     "python_data_config": {
                         "rate": 16000, "feat_type": "mfcc",
                         "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                                  "energy": True, "normalize": True, "delta": False,
                                  "win_len": 0.025, "win_shift": 0.01}}},
            "model": {"arch": "tdnn", "tdnn": {
                "input_dim": 24, "hidden_dim": [32, 32, 64],
                "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]],
                "tdnn_layers": 3, "embedding_dim": 16,
                "pooling": "statistic", "attention_hidden_size": 8,
                "bn_first": True}},
            "train": {"type": "sgd", "bs": 8, "lr_decay": 0.1,
                      "lr_decay_step": [50], "epoch": 1, "loss": "Triplet",
                      "margin": [0.2, 0.2], "triplet_strategy": "hardest",
                      "frame_buckets": 2, "log_every": 0,
                      "sgd": {"init_lr": 0.05, "weight_decay": 0, "momentum": 0.9}},
            "test": {},
        }
    )
    trainer = AudioTrainer(cfg, mesh=make_mesh(), exp_root=str(tmp_path / "exp"),
                           log_time="t0")
    import numpy as _np

    rng = _np.random.default_rng(0)
    samples = samples_for_frames(32, 0.025, 0.01, 16000)
    from deeplip_tpu.core.mesh import data_sharding
    import jax

    pcm = jax.device_put(rng.standard_normal((8, samples)).astype(_np.float32),
                         data_sharding(trainer.mesh, 2))
    labels = jax.device_put(rng.integers(0, 3, 8).astype(_np.int64),
                            data_sharding(trainer.mesh, 1))
    state = trainer.ensure_state()
    state, metrics = trainer._train_step(state, pcm, labels, jnp.float32(0.2))
    assert np.isfinite(float(metrics["loss"]))


def test_optimizer_state_checkpoint_roundtrip(tmp_path):
    """opt_state is saved with each checkpoint and restorable on demand."""
    import jax
    import jax.numpy as jnp

    from deeplip_tpu.data.synthetic import make_audio_corpus
    from deeplip_tpu.core.mesh import data_sharding
    from deeplip_tpu.ops.framing import samples_for_frames

    root = str(tmp_path / "c")
    make_audio_corpus(root, n_spk=2, utts_per_spk=2, duration=1.0)
    base = {
        "data": {"frames": [30, 40],
                 "train_manifest": os.path.join(root, "manifest.csv"),
                 "python_data_config": {
                     "rate": 16000, "feat_type": "mfcc",
                     "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                              "energy": True, "normalize": True, "delta": False,
                              "win_len": 0.025, "win_shift": 0.01}}},
        "model": {"arch": "tdnn", "tdnn": {
            "input_dim": 24, "hidden_dim": [16, 32],
            "context": [[-2, -1, 0, 1, 2], [0]],
            "tdnn_layers": 2, "embedding_dim": 8,
            "pooling": "statistic", "attention_hidden_size": 4,
            "bn_first": True}},
        "train": {"type": "sgd", "bs": 8, "lr_decay": 0.1, "lr_decay_step": [50],
                  "epoch": 1, "loss": "LMCL", "scale": 30, "margin": [0.2, 0.2],
                  "frame_buckets": 2, "log_every": 0,
                  "sgd": {"init_lr": 0.05, "weight_decay": 0, "momentum": 0.9}},
        "test": {},
    }
    import numpy as _np

    t1 = AudioTrainer(Config(base), mesh=make_mesh(),
                      exp_root=str(tmp_path / "exp"), log_time="o0")
    rng = _np.random.default_rng(0)
    samples = samples_for_frames(32, 0.025, 0.01, 16000)
    pcm = jax.device_put(rng.standard_normal((8, samples)).astype(_np.float32),
                         data_sharding(t1.mesh, 2))
    labels = jax.device_put(rng.integers(0, 2, 8).astype(_np.int64),
                            data_sharding(t1.mesh, 1))
    state = t1.ensure_state()
    state, _ = t1._train_step(state, pcm, labels, jnp.float32(0.2))
    t1.state = state
    t1.save(1)

    t2 = AudioTrainer(Config(base), mesh=make_mesh(),
                      exp_root=str(tmp_path / "exp"), log_time="o0")
    t2.load(os.path.join(t1.exp_dir, "net_1"), restore_optimizer=True)
    want = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.opt_state))
    got = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, t2.state.opt_state))
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_async_checkpoint_roundtrip(tmp_path):
    from deeplip_tpu.train import checkpoint as ckpt

    tree = {"epoch": 1,
            "params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
            "batch_stats": {}, "opt_state": {}}
    ckpt.save_checkpoint(str(tmp_path), 1, tree, asynchronous=True)
    ckpt.wait_for_saves()
    loaded = ckpt.load_checkpoint(str(tmp_path), 1)
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])
    # load without explicit wait must also be safe (implicit wait)
    ckpt.save_checkpoint(str(tmp_path), 2, tree, asynchronous=True)
    loaded2 = ckpt.load_checkpoint(str(tmp_path), 2)
    assert int(loaded2["epoch"]) == 1
