"""CLI smoke tests: the reference's entry-point surface must work end-to-end."""

import json
import os

import numpy as np
import pytest
import yaml

from deeplip_tpu.data.manifest import SpeakerManifest
from deeplip_tpu.data.synthetic import make_audio_corpus, make_trial_list, make_video_corpus


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    make_audio_corpus(root, n_spk=3, utts_per_spk=4, duration=1.5)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = os.path.join(root, "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=60)
    return root, manifest, trial_path


def _write_audio_config(path, root, trial_path):
    cfg = {
        "data": {
            "frames": [40, 60],
            "train_manifest": os.path.join(root, "manifest.csv"),
            "test_root": root,
            "trial_grid": trial_path,
            "python_data_config": {
                "rate": 16000,
                "feat_type": "mfcc",
                "mfcc": {
                    "n_fft": 512, "num_bin": 26, "num_cep": 24, "energy": True,
                    "normalize": True, "delta": False,
                    "win_len": 0.025, "win_shift": 0.01,
                },
            },
        },
        "model": {
            "arch": "tdnn",
            "tdnn": {
                "input_dim": 24,
                "hidden_dim": [32, 32, 64],
                "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]],
                "tdnn_layers": 3,
                "embedding_dim": 16,
                "pooling": "statistic",
                "attention_hidden_size": 8,
                "bn_first": True,
            },
        },
        "train": {
            "type": "sgd", "bs": 8, "lr_decay": 0.1, "lr_decay_step": [50],
            "epoch": 1, "loss": "LMCL", "scale": 30, "margin": [0.2, 0.2],
            "frame_buckets": 2, "loader_workers": 2, "log_every": 0,
            "sgd": {"init_lr": 0.05, "weight_decay": 1e-5, "momentum": 0.9},
        },
        "test": {"eval_grid": True, "use_cos": True, "bucket_frames": 50,
                 "batch_size": 8},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def test_cli_train_audio_mode_train(cli_corpus, tmp_path, capsys):
    from deeplip_tpu.cli.train_audio import main

    root, _, trial_path = cli_corpus
    cfg_path = str(tmp_path / "audio.yaml")
    _write_audio_config(cfg_path, root, trial_path)
    main(["--config", cfg_path, "--mode", "train",
          "--exp-root", str(tmp_path / "exp"), "--log-time", "cli0"])
    out = capsys.readouterr().out
    assert "EER:" in out
    # average checkpoint written, npy tree saved
    assert os.path.isdir(str(tmp_path / "exp" / "cli0" / "net_avg"))
    assert os.path.isdir(str(tmp_path / "exp" / "cli0" / "test_xv"))


def test_cli_train_video_extract(tmp_path, capsys):
    from deeplip_tpu.cli.train_video import main

    vroot = str(tmp_path / "video")
    make_video_corpus(vroot, n_spk=2, clips_per_spk=2, t=6, size=96)
    cfg_path = str(tmp_path / "video.json")
    json.dump(
        {
            "backbone_type": "resnet", "relu_type": "prelu",
            "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_kernel_size": [3],
            "tcn_num_layers": 1, "tcn_width_mult": 1, "width_mult": 1.0,
        },
        open(cfg_path, "w"),
    )
    out_dir = str(tmp_path / "embedding")
    main([
        "--config-path", cfg_path, "--data-dir", vroot, "--extract-feats",
        "--mouth-embedding-out-path", out_dir, "--batch-size", "4",
        "--workers", "1", "--exp-root", str(tmp_path / "exp"),
    ])
    assert "extracted 4 clip feature arrays" in capsys.readouterr().out
    saved = [f for _, _, fs in os.walk(out_dir) for f in fs]
    assert len(saved) == 4


def test_cli_av_test_with_plda(cli_corpus, tmp_path, capsys):
    """av_test mode: per-list extraction + cosine and PLDA EERs."""
    import yaml as _yaml

    from deeplip_tpu.cli.train_audio import main

    root, manifest, trial_path = cli_corpus
    cfg_path = str(tmp_path / "audio_av.yaml")
    _write_audio_config(cfg_path, root, trial_path)
    cfg = _yaml.safe_load(open(cfg_path))
    # dev list: all corpus utterances, names like sNN/uM.wav; labels need the
    # sNN_ prefix convention, so write names as sNN_uM.wav copies
    dev_root = str(tmp_path / "dev")
    names = []
    import shutil

    for s, spk in enumerate(manifest.speakers):
        for u in spk:
            name = f"s{s:02d}_{os.path.basename(u.path)}"
            os.makedirs(dev_root, exist_ok=True)
            shutil.copy(u.path, os.path.join(dev_root, name))
            names.append(name)
    dev_list = str(tmp_path / "devlist.txt")
    open(dev_list, "w").write("\n".join(names) + "\n")
    cfg["data"]["trial_lomgrid"] = trial_path
    cfg["data"]["plda_dev_list"] = dev_list
    cfg["data"]["dev_root"] = dev_root
    cfg["test"].update(
        {"eval_lomgrid": True, "eval_grid": False, "use_cos": True,
         "use_plda": True, "train_plda": True}
    )
    _yaml.safe_dump(cfg, open(cfg_path, "w"))
    main(["--config", cfg_path, "--mode", "av_test",
          "--exp-root", str(tmp_path / "exp"), "--log-time", "cli1"])
    out = capsys.readouterr().out
    assert "cosine EER" in out and "PLDA EER" in out
    assert os.path.exists(str(tmp_path / "exp" / "cli1" / "plda.npz"))


def test_cli_fusion_make_trainer(tmp_path):
    """train_fusion CLI: config parsing + trainer construction + video map."""
    import yaml as _yaml

    from deeplip_tpu.cli.train_fusion import build_video_map, make_trainer
    from deeplip_tpu.core.config import load_fusion_config
    from deeplip_tpu.data.manifest import SpeakerManifest
    from deeplip_tpu.data.synthetic import make_audio_corpus, make_video_corpus

    root = str(tmp_path / "corpus")
    make_audio_corpus(root, n_spk=2, utts_per_spk=2, duration=0.8)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    vroot = str(tmp_path / "video")
    # clips named after utterance stems under matching speaker dirs
    for s, spk in enumerate(manifest.speakers):
        os.makedirs(os.path.join(vroot, f"s{s:02d}"), exist_ok=True)
        for u in spk:
            stem = os.path.splitext(os.path.basename(u.path))[0]
            np.savez(os.path.join(vroot, f"s{s:02d}", stem + ".npz"),
                     data=np.zeros((4, 96, 96), np.uint8))

    cfg = {
        "data": {
            "frames": [30, 40],
            "train_manifest": os.path.join(root, "manifest.csv"),
            "video_root": vroot,
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
                  "sgd": {"init_lr": 0.5, "weight_decay": 1e-5, "momentum": 0.9},
                  "resume": "None",
                  "audio_config": {"resume": "None"},
                  "video_config": {"resume": "None"}},
        "test": {"eval_grid": False, "eval_lomgrid": False},
    }
    cfg_path = str(tmp_path / "fusion.yaml")
    _yaml.safe_dump(cfg, open(cfg_path, "w"))
    loaded = load_fusion_config(cfg_path)
    trainer = make_trainer(loaded, str(tmp_path / "exp"), "fc0")
    assert trainer.n_spk == 2
    vmap = build_video_map(trainer._manifest, vroot)
    assert len(vmap) == 4  # every utterance paired


def test_root_shims_help():
    """The reference-surface shims (python train_*.py) parse --help."""
    import subprocess
    import sys as _sys

    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu")
    for shim in ("train_audio.py", "train_video.py", "train_fusion.py"):
        res = subprocess.run([_sys.executable, shim, "--help"],
                             capture_output=True, text=True, env=env,
                             cwd="/root/repo", timeout=120)
        assert res.returncode == 0, res.stderr
        assert "usage" in res.stdout.lower()


def test_cli_fusion_test_and_av_fusion_modes(tmp_path, capsys):
    """Fusion CLI eval surface (VERDICT r2 missing #1): --mode test scores
    the fused concat embedding; --mode av_fusion runs score-level 0.5/0.5
    late fusion from separate audio/video embeddings (reference
    train_fusion.py:423-470)."""
    import yaml as _yaml

    from deeplip_tpu.cli.train_fusion import main
    from deeplip_tpu.core.config import load_fusion_config  # noqa: F401

    root = str(tmp_path / "corpus")
    make_audio_corpus(root, n_spk=2, utts_per_spk=2, duration=0.8)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = str(tmp_path / "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=8)
    vroot = str(tmp_path / "video")
    rng = np.random.default_rng(0)
    for s, spk in enumerate(manifest.speakers):
        os.makedirs(os.path.join(vroot, f"s{s:02d}"), exist_ok=True)
        for u in spk:
            stem = os.path.splitext(os.path.basename(u.path))[0]
            np.savez(os.path.join(vroot, f"s{s:02d}", stem + ".npz"),
                     data=rng.integers(0, 255, (4, 96, 96)).astype(np.uint8))

    cfg = {
        "data": {
            "frames": [30, 40],
            "train_manifest": os.path.join(root, "manifest.csv"),
            "video_root": vroot, "test_root": root,
            "trial_grid": trial_path,
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
                  "sgd": {"init_lr": 0.5, "weight_decay": 1e-5, "momentum": 0.9},
                  "resume": "None",
                  "audio_config": {"resume": "None"},
                  "video_config": {"resume": "None"}},
        "test": {"eval_grid": True, "eval_lomgrid": False, "use_cos": True},
    }
    cfg_path = str(tmp_path / "fusion.yaml")
    _yaml.safe_dump(cfg, open(cfg_path, "w"))

    main(["--config", cfg_path, "--mode", "test",
          "--exp-root", str(tmp_path / "exp"), "--log-time", "fx0"])
    out = capsys.readouterr().out
    assert "fusion EER" in out
    assert os.path.isdir(str(tmp_path / "exp" / "fx0" / "test_em_trial_grid"))

    main(["--config", cfg_path, "--mode", "av_fusion",
          "--exp-root", str(tmp_path / "exp"), "--log-time", "fx1"])
    out = capsys.readouterr().out
    assert "score-fusion EER" in out
    assert os.path.isdir(str(tmp_path / "exp" / "fx1" / "test_xv_trial_grid"))
    assert os.path.isdir(
        str(tmp_path / "exp" / "fx1" / "test_em_video_trial_grid"))

    # av_fusion + PLDA back-end: the fused store is derived from the parts
    # already extracted (z-norm+concat, no second device sweep). Dev names
    # carry the sNN_ label prefix (labels_from_speaker_prefix) and get
    # matching top-level video clips.
    import shutil

    dev_root = str(tmp_path / "dev")
    os.makedirs(dev_root, exist_ok=True)
    dev_names = []
    for s, spk in enumerate(manifest.speakers):
        for u in spk:
            name = f"s{s:02d}_{os.path.basename(u.path)}"
            shutil.copy(u.path, os.path.join(dev_root, name))
            np.savez(os.path.join(vroot, os.path.splitext(name)[0] + ".npz"),
                     data=rng.integers(0, 255, (4, 96, 96)).astype(np.uint8))
            dev_names.append(name)
    dev_list = str(tmp_path / "plda_dev.txt")
    open(dev_list, "w").write("\n".join(dev_names) + "\n")
    cfg["data"]["plda_dev_list"] = dev_list
    cfg["data"]["dev_root"] = dev_root
    cfg["test"].update({"use_plda": True, "train_plda": True,
                        "plda_components": 2})
    _yaml.safe_dump(cfg, open(cfg_path, "w"))
    main(["--config", cfg_path, "--mode", "av_fusion",
          "--exp-root", str(tmp_path / "exp"), "--log-time", "fx2"])
    out = capsys.readouterr().out
    assert "score-fusion EER" in out
    assert "PLDA EER" in out


def test_cli_kaldi_xv_roundtrip(tmp_path, capsys):
    """kaldi-xv transform commands (VERDICT r2 missing #2): Kaldi scp ->
    npy tree with the vox-style name remap, and back to ark/scp
    (reference train_audio.py:443-471), including the augment-suffix quirk."""
    from deeplip_tpu.cli.kaldi_xv import kaldi_name_to_path, main
    from deeplip_tpu.interop.kaldi import read_scp, write_ark_scp

    # name remap parity with the reference string surgery. from-kaldi is
    # the UNCONDITIONAL split (train_audio.py:446-447) — an augment-like
    # trailing token stays part of the filename; only to-kaldi applies the
    # augment quirk (train_audio.py:464-467).
    assert kaldi_name_to_path("id10270-x6uYqmx31kE-00001.wav") == \
        "id10270/x6uYqmx31kE/00001.wav"
    assert kaldi_name_to_path("id10270-x6uYqmx31kE-00001-reverb") == \
        "id10270/x6uYqmx31kE-00001/reverb"
    assert kaldi_name_to_path("id10270-x6uYqmx31kE-00001-reverb",
                              augment=True) == \
        "id10270/x6uYqmx31kE/reverb/00001"
    assert kaldi_name_to_path("id1-a-b-c-00002-music", augment=True) == \
        "id1/a-b-c/music/00002"

    rng = np.random.default_rng(3)
    clean_ids = ["id10270-x6uYqmx31kE-00001.wav",
                 "id10270-x6uYqmx31kE-00002.wav"]
    aug_id = "id10271-zz9-00001-babble"
    vecs = {u: rng.standard_normal(16).astype(np.float32)
            for u in clean_ids + [aug_id]}
    src_prefix = str(tmp_path / "src")
    write_ark_scp({u: vecs[u] for u in clean_ids},
                  src_prefix + ".ark", src_prefix + ".scp")

    out_dir = str(tmp_path / "npy_tree")
    main(["from-kaldi", "--scp", src_prefix + ".scp", "--out-dir", out_dir])
    assert "wrote 2 npy vectors" in capsys.readouterr().out
    a = np.load(os.path.join(out_dir, "id10270/x6uYqmx31kE/00001.npy"))
    np.testing.assert_array_equal(a, vecs[clean_ids[0]])

    # the augmented utterance's npy lives at the trainer's extraction
    # layout spk/rec/aug/file (what to-kaldi's augment branch resolves)
    aug_dir = os.path.join(out_dir, "id10271/zz9/babble")
    os.makedirs(aug_dir)
    np.save(os.path.join(aug_dir, "00001.npy"), vecs[aug_id])
    back_scp = str(tmp_path / "ori.scp")
    with open(back_scp, "w") as f:
        for u in clean_ids + [aug_id]:
            f.write(f"{u} ignored\n")

    out_prefix = str(tmp_path / "back")
    main(["to-kaldi", "--scp", back_scp, "--xv-root", out_dir,
          "--out-prefix", out_prefix])
    assert "wrote 3 vectors" in capsys.readouterr().out
    back = dict(read_scp(out_prefix + "_xvector.scp"))
    assert list(back) == clean_ids + [aug_id]  # scp ordering preserved
    for u in clean_ids + [aug_id]:
        np.testing.assert_array_equal(back[u], vecs[u])

def test_cli_fusion_mixed_geometry_clips(tmp_path):
    """extract_pairs must center-crop each clip BEFORE buffering
    (cli/train_fusion.py): embedding a clip is invariant to growing its
    canvas with border pixels, and mixed H/W within one chunk must not
    shift smaller clips off-center or average zero padding into the trunk
    (r3 review finding on the r2 mixed-geometry fix)."""
    import yaml as _yaml

    from deeplip_tpu.cli.train_fusion import extract_pairs, make_trainer
    from deeplip_tpu.core.config import load_fusion_config

    root = str(tmp_path / "corpus")
    make_audio_corpus(root, n_spk=2, utts_per_spk=1, duration=0.8)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    names = ["/".join(u.path.split(os.sep)[-2:])
             for spk in manifest.speakers for u in spk]

    rng = np.random.default_rng(0)
    clips = [rng.integers(0, 255, (4, 96, 96)).astype(np.uint8)
             for _ in names]
    vroot_a = str(tmp_path / "video_a")   # uniform 96x96
    vroot_b = str(tmp_path / "video_b")   # first clip on a 112x112 canvas
    for vroot, pad_first in ((vroot_a, False), (vroot_b, True)):
        for i, name in enumerate(names):
            spk_dir, fname = os.path.split(name)
            stem = os.path.splitext(fname)[0]
            os.makedirs(os.path.join(vroot, spk_dir), exist_ok=True)
            d = clips[i]
            if pad_first and i == 0:
                # +8 border pixels per side: the (88,88) center crop of the
                # 112x112 canvas is exactly the center crop of the original
                d = np.pad(d, ((0, 0), (8, 8), (8, 8)))
            np.savez(os.path.join(vroot, spk_dir, stem + ".npz"), data=d)

    cfg_dict = {
        "data": {
            "frames": [30, 40],
            "train_manifest": os.path.join(root, "manifest.csv"),
            "video_root": vroot_a, "test_root": root,
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
        "train": {"optimizer": "sgd", "bs": 4, "lr_decay_step": [4],
                  "lr_decay": 0.1, "epoch": 1, "loss": "CrossEntropy",
                  "max_clips": 1, "clip_frames": 4,
                  "sgd": {"init_lr": 0.5, "weight_decay": 1e-5,
                          "momentum": 0.9},
                  "resume": "None",
                  "audio_config": {"resume": "None"},
                  "video_config": {"resume": "None"}},
        "test": {},
    }
    cfg_path = str(tmp_path / "fusion.yaml")
    _yaml.safe_dump(cfg_dict, open(cfg_path, "w"))
    cfg_a = load_fusion_config(cfg_path)
    cfg_dict["data"]["video_root"] = vroot_b
    cfg_path_b = str(tmp_path / "fusion_b.yaml")
    _yaml.safe_dump(cfg_dict, open(cfg_path_b, "w"))
    cfg_b = load_fusion_config(cfg_path_b)

    trainer = make_trainer(cfg_a, str(tmp_path / "exp"), "mixed0")
    _, video_a = extract_pairs(trainer, cfg_a, names, return_parts=True)
    _, video_b = extract_pairs(trainer, cfg_b, names, return_parts=True)
    for n in names:
        np.testing.assert_array_equal(video_a[n], video_b[n])


def test_cli_fusion_head_resume(tmp_path):
    """train.resume for the fusion head (reference resume_fusion,
    train_fusion.py:127-129,203-208): eval-mode make_trainer must load a
    reference ``.pth`` via the torch importer AND our own orbax ``net_<tag>``
    checkpoints; train mode leaves the head fresh (the reference loads
    resume_fusion only for evaluation — auto_resume handles train
    continuation)."""
    import torch

    from deeplip_tpu.cli.train_fusion import make_trainer
    from deeplip_tpu.core.config import load_fusion_config

    cfg = {
        "data": {
            "frames": [30, 40],
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
        "train": {"optimizer": "sgd", "bs": 4, "n_spk": 2,
                  "lr_decay_step": [4, 8], "lr_decay": 0.1, "epoch": 1,
                  "loss": "CrossEntropy", "max_clips": 1, "clip_frames": 4,
                  "sgd": {"init_lr": 0.5, "weight_decay": 1e-5,
                          "momentum": 0.9},
                  "resume": "None",
                  "audio_config": {"resume": "None"},
                  "video_config": {"resume": "None"}},
        "test": {"eval_grid": False, "eval_lomgrid": False},
    }
    cfg_path = str(tmp_path / "fusion.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    t0 = make_trainer(load_fusion_config(cfg_path), str(tmp_path / "exp"),
                      "hr0", mode="av_fusion")
    fusion0 = t0.ensure_state().params["fusion"]
    rng = np.random.default_rng(7)
    # the reference checkpoint's state_dict holds exactly LowFER's U/V
    # (LBP.py:12-15)
    sd = {k: torch.tensor(rng.uniform(-1, 1, np.shape(fusion0[k])),
                          dtype=torch.float32)
          for k in ("U", "V")}
    pth = str(tmp_path / "net_avg.pth")
    torch.save({"epoch": 5, "state_dict": sd}, pth)

    cfg["train"]["resume"] = pth
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    t1 = make_trainer(load_fusion_config(cfg_path), str(tmp_path / "exp"),
                      "hr1", mode="av_fusion")
    got = t1.ensure_state().params["fusion"]
    for k in sd:
        np.testing.assert_array_equal(np.asarray(got[k]), sd[k].numpy())

    # train mode: resume_fusion is an eval-only input in the reference
    t2 = make_trainer(load_fusion_config(cfg_path), str(tmp_path / "exp"),
                      "hr2", mode="train")
    for k in sd:
        assert not np.array_equal(
            np.asarray(t2.ensure_state().params["fusion"][k]), sd[k].numpy())

    # our own orbax checkpoint via the same config key
    t1.current_epoch = 1
    t1.save(1)
    cfg["train"]["resume"] = os.path.join(t1.exp_dir, "net_1")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    t3 = make_trainer(load_fusion_config(cfg_path), str(tmp_path / "exp"),
                      "hr3", mode="test")
    got3 = t3.ensure_state().params["fusion"]
    for k in sd:
        np.testing.assert_array_equal(np.asarray(got3[k]), sd[k].numpy())
    assert t3.current_epoch == 1


def test_cli_export_torch_audio_roundtrip(tmp_path):
    """export_torch audio: orbax net_<tag> -> reference .pth, re-importable
    bit-equal with epoch + criterion preserved."""
    import torch  # noqa: F401  (export needs torch)

    from deeplip_tpu.cli.export_torch import main as export_main
    from deeplip_tpu.interop.torch_import import load_reference_audio_checkpoint
    from deeplip_tpu.train import checkpoint as ckpt
    from tests.test_torch_export import _init_audio_model

    _, params, stats = _init_audio_model()
    rng = np.random.default_rng(1)
    crit = {"weights": rng.standard_normal((5, 32)).astype(np.float32)}
    exp_dir = str(tmp_path / "exp")
    ckpt.save_checkpoint(exp_dir, "avg", {
        "epoch": 3,
        "params": {"model": params, "criterion": crit},
        "batch_stats": {"model": stats},
    })

    out = str(tmp_path / "net_avg.pth")
    export_main(["audio", "--checkpoint", os.path.join(exp_dir, "net_avg"),
                 "--out", out])

    params2, stats2 = load_reference_audio_checkpoint(out, n_blocks=5)
    import jax

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 params, params2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 stats, stats2)
    loaded = torch.load(out, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 3
    np.testing.assert_array_equal(
        loaded["criterion_state_dict"]["weights"].numpy(), crit["weights"])


def test_cli_verify_service(cli_corpus, tmp_path, capsys):
    """deeplip-verify: enroll -> calibrate -> cohort -> verify -> identify,
    with state persisted under the profiles dir across invocations."""
    from deeplip_tpu.cli.verify import main

    root, manifest, trial_path = cli_corpus
    cfg_path = str(tmp_path / "audio.yaml")
    _write_audio_config(cfg_path, root, trial_path)
    profiles = str(tmp_path / "profiles")
    common = ["-c", cfg_path, "-p", profiles,
              "--exp-root", str(tmp_path / "exp")]

    spk0 = [u.path for u in manifest.speakers[0]]
    impostors = [u.path for spk in manifest.speakers[1:] for u in spk]

    main(["enroll", *common, "alice", spk0[0], spk0[1]])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"enrolled": "alice", "n_utts": 2, "n_speakers": 1}
    assert os.path.exists(os.path.join(profiles, "alice.npy"))

    main(["calibrate", *common, "--trials", trial_path, "--root", root])
    cal = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= cal["eer"] <= 1.0
    assert os.path.exists(os.path.join(profiles, "_threshold.json"))

    # verify picks up the persisted threshold (the net is random-init, so
    # only the decision plumbing is asserted, not speaker separability)
    main(["verify", *common, "alice", spk0[2]])
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["threshold"] == pytest.approx(cal["threshold"])
    assert r1["accept"] == (r1["score"] >= r1["threshold"])

    main(["cohort", *common, "--top-k", "4", *impostors])
    coh = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert coh == {"cohort_size": len(impostors), "top_k": 4}

    # the persisted threshold was calibrated on the raw-cosine scale; the
    # cohort switched scoring to the AS-normed scale, so the loader must
    # refuse the stale threshold (fingerprint mismatch) and verify must
    # fail cleanly instead of deciding against a wrong-scale threshold
    with pytest.raises(ValueError, match="no operating threshold"):
        main(["verify", *common, "alice", spk0[2]])
    capsys.readouterr()

    # recalibrate on the AS-normed scale
    main(["calibrate", *common, "--trials", trial_path, "--root", root])
    cal2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cal2["threshold"] != pytest.approx(cal["threshold"])

    main(["verify", *common, "alice", spk0[2]])
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["score"] != pytest.approx(r1["score"])  # normalized scale
    assert r2["threshold"] == pytest.approx(cal2["threshold"])

    main(["identify", *common, "--top-k", "1", spk0[3]])
    ident = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ident["ranking"][0]["speaker"] == "alice"

    # r4 review regression: a LEGACY _threshold.json (predates cohort_fp)
    # must be treated as a scale mismatch while a cohort is active — not
    # silently applied to AS-normed scores
    tf = os.path.join(profiles, "_threshold.json")
    rec = json.load(open(tf))
    legacy = {k: v for k, v in rec.items() if k != "cohort_fp"}
    json.dump(legacy, open(tf, "w"))
    with pytest.raises(ValueError, match="no operating threshold"):
        main(["verify", *common, "alice", spk0[2]])
    capsys.readouterr()
    # ...but on the raw-cosine scale (no cohort) a legacy record is valid
    os.remove(os.path.join(profiles, "_cohort.npz"))
    main(["verify", *common, "alice", spk0[2]])
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["threshold"] == pytest.approx(legacy["threshold"])
    json.dump(rec, open(tf, "w"))  # restore for the blocks below
    main(["cohort", *common, "--top-k", "4", *impostors])
    capsys.readouterr()
    main(["calibrate", *common, "--trials", trial_path, "--root", root])
    capsys.readouterr()

    # a cohort built under a different model identity (config/checkpoint
    # path) warns on later use: its embeddings may come from another space
    import shutil

    cfg2 = str(tmp_path / "audio_other.yaml")
    shutil.copy(cfg_path, cfg2)
    main(["cohort", "-c", cfg2, "-p", profiles,
          "--exp-root", str(tmp_path / "exp"), "--top-k", "4", *impostors])
    capsys.readouterr()
    main(["calibrate", *common, "--trials", trial_path, "--root", root])
    err = capsys.readouterr().err
    assert "config" in err and "different" in err

    # a typo'd --profiles path on read-only commands must error cleanly,
    # NOT create an empty dir and fail with a raw KeyError
    missing = str(tmp_path / "no_such_profiles")
    with pytest.raises(SystemExit, match="does not exist"):
        main(["verify", "-c", cfg_path, "-p", missing,
              "--exp-root", str(tmp_path / "exp"), "alice", spk0[2]])
    assert not os.path.exists(missing)
    capsys.readouterr()
