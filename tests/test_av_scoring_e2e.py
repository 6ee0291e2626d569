"""AV verification back-ends end-to-end: audio + video embedding stores →
cosine / score-fusion / feature-fusion EER over a synthetic trial list."""

import os

import numpy as np
import pytest

# Conv3D-heavy lane: dominates suite wall time on the CPU mesh (fast lane:
# `pytest -m "not slow"`; the driver/CI run the full suite)
pytestmark = pytest.mark.slow

from deeplip_tpu.core.config import Config
from deeplip_tpu.core.mesh import make_mesh
from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
from deeplip_tpu.data.synthetic import make_audio_corpus, make_trial_list, synth_video_clip
from deeplip_tpu.data.video_dataset import VideoClip, VideoClipBatches
from deeplip_tpu.eval.scoring import TrialList, cosine_eer, feature_fusion_eer, score_fusion_eer
from deeplip_tpu.train.audio import AudioTrainer
from deeplip_tpu.train.video import VideoTrainer



@pytest.fixture(scope="module")
def av_eval_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aveval"))
    _, manifest = make_audio_corpus(root, n_spk=3, utts_per_spk=3, duration=1.2)
    trial_path = os.path.join(root, "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=80)
    # one video clip per utterance, named to match the utterance
    rng = np.random.default_rng(0)
    clips = []
    for s, spk in enumerate(manifest.speakers):
        vdir = os.path.join(root, "videos", f"s{s:02d}")
        os.makedirs(vdir, exist_ok=True)
        for utt in spk:
            stem = os.path.splitext(os.path.basename(utt.path))[0]
            data = synth_video_clip(rng, speaker_seed=2000 + s, t=8, size=96)
            path = os.path.join(vdir, stem + ".npz")
            np.savez(path, data=data)
            clips.append(VideoClip(path, s, f"s{s:02d}/{stem}"))
    return root, manifest, trial_path, clips


def test_av_backends_run(av_eval_corpus, tmp_path):
    root, manifest, trial_path, clips = av_eval_corpus
    trials = TrialList.load(trial_path)
    mesh = make_mesh()

    # audio store from an untrained (random-weight) trainer — back-end
    # mechanics are what's under test, not model quality
    audio_cfg = Config(
        {
            "data": {"frames": [40, 60], "python_data_config": {
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
            "train": {"loss": "LMCL", "scale": 30, "margin": [0.2, 0.2],
                      "type": "sgd", "bs": 8,
                      "sgd": {"init_lr": 0.01, "weight_decay": 0, "momentum": 0.9},
                      "lr_decay": 0.1, "lr_decay_step": [10], "epoch": 1},
            "test": {},
        }
    )
    atrainer = AudioTrainer(audio_cfg, mesh=mesh, n_spk=3,
                            exp_root=str(tmp_path / "exp"), log_time="a")
    utts = [
        EvalUtterance("/".join(u.path.split(os.sep)[-2:]), u.path)
        for _, u in manifest.all_utterances()
    ]
    astore = atrainer.extract_embeddings(
        EvalUtteranceSet(utts, batch_size=8, bucket_frames=60, num_workers=1)
    )

    vtrainer = VideoTrainer(
        Config({"backbone_type": "resnet", "relu_type": "prelu",
                "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_kernel_size": [3],
                "tcn_num_layers": 1, "tcn_width_mult": 1, "width_mult": 1.0}),
        num_classes=3, mesh=mesh, hidden_dim=8, crop_size=(32, 32),
        trunk_layers=(1, 1, 1, 1),
        exp_root=str(tmp_path / "exp"), log_time="v",
    )
    vstore = vtrainer.embedding_store(
        VideoClipBatches(clips, batch_size=8, bucket_t=4, shuffle=False, num_workers=1),
        name_map=lambda clip_name: clip_name + ".wav",
    )
    assert set(trials.unique_utts) <= set(vstore.table.keys())

    e_a, _ = cosine_eer(trials, astore)
    e_sf, _ = score_fusion_eer(trials, astore, vstore)
    e_ff, _ = feature_fusion_eer(trials, astore, vstore)
    for e in (e_a, e_sf, e_ff):
        assert 0.0 <= e <= 1.0
