"""End-to-end audio-visual fusion: paired synthetic corpus → frozen encoders
→ batched-clip fusion training → paired test extraction → feature-fusion EER."""

import os

import numpy as np
import pytest

# Conv3D-heavy lane: dominates suite wall time on the CPU mesh (fast lane:
# `pytest -m "not slow"`; the driver/CI run the full suite)
pytestmark = pytest.mark.slow

from deeplip_tpu.core.config import Config
from deeplip_tpu.core.mesh import make_mesh
from deeplip_tpu.data.fusion_pipeline import AVTrainPipeline
from deeplip_tpu.data.manifest import SpeakerManifest
from deeplip_tpu.data.synthetic import make_audio_corpus, synth_video_clip
from deeplip_tpu.train.fusion import FusionTrainer

TINY_AUDIO_MODEL = {
    "arch": "tdnn",
    "tdnn": {
        "input_dim": 24,
        "hidden_dim": [32, 32, 64],
        "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]],
        "tdnn_layers": 3,
        "embedding_dim": 24,
        "pooling": "statistic",
        "attention_hidden_size": 8,
        "bn_first": True,
    },
}

TINY_VIDEO_CFG = Config(
    {
        "backbone_type": "resnet",
        "relu_type": "prelu",
        "tcn_dropout": 0.2,
        "tcn_dwpw": False,
        "tcn_kernel_size": [3],
        "tcn_num_layers": 1,
        "tcn_width_mult": 1,
        "width_mult": 1.0,
    }
)

AUDIO_DATA = {
    "rate": 16000,
    "feat_type": "mfcc",
    "mfcc": {
        "n_fft": 512, "num_bin": 26, "num_cep": 24, "energy": True,
        "normalize": True, "delta": False, "win_len": 0.025, "win_shift": 0.01,
    },
}


@pytest.fixture(scope="module")
def av_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("av"))
    make_audio_corpus(root, n_spk=3, utts_per_spk=3, duration=1.5)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    # one synthetic video clip per utterance, speaker-distinct
    rng = np.random.default_rng(0)
    video_map = {}
    vdir = os.path.join(root, "video")
    for s, spk in enumerate(manifest.speakers):
        os.makedirs(os.path.join(vdir, f"s{s:02d}"), exist_ok=True)
        for i, utt in enumerate(spk):
            clip = synth_video_clip(rng, speaker_seed=2000 + s, t=8, size=96)
            path = os.path.join(vdir, f"s{s:02d}", f"c{i}.npz")
            np.savez(path, data=clip)
            video_map[utt.path] = [path]
    return manifest, video_map


def test_fusion_train_and_extract(av_corpus, tmp_path):
    manifest, video_map = av_corpus
    mesh = make_mesh()
    trainer = FusionTrainer(
        TINY_AUDIO_MODEL,
        TINY_VIDEO_CFG,
        n_spk=manifest.n_spk,
        audio_data_opts=AUDIO_DATA,
        mesh=mesh,
        lr=0.05,
        steps_per_epoch=4,
        video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32),
        exp_root=str(tmp_path / "exp"),
        log_time="f0",
    )
    trainer.init_encoders()
    pipeline = AVTrainPipeline(
        manifest, video_map, batch_size=8, frame_range=(40, 60),
        n_buckets=2, max_clips=2, clip_frames=8, num_workers=2,
    )
    state = trainer.train(pipeline, epochs=2)
    assert os.path.isdir(os.path.join(trainer.exp_dir, "net_2"))
    trainer.model_average(avg_num=2)
    assert os.path.isdir(os.path.join(trainer.exp_dir, "net_avg"))

    # metric fetches are gated to log cadence (r2: a per-step device fetch
    # serialized the loop); short epochs log at least the epoch-end record
    records = open(os.path.join(trainer.exp_dir, "fusion_metrics.jsonl")).readlines()
    assert len(records) >= 2  # one per epoch minimum

    # paired test extraction: one utterance per speaker
    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.data.video_dataset import load_clip
    from deeplip_tpu.ops.framing import num_frames

    pcm_list, names = [], []
    max_s = 0
    for s, spk in enumerate(manifest.speakers):
        y, _ = read_wav(spk[0].path)
        pcm_list.append(y)
        names.append(f"s{s}")
        max_s = max(max_s, len(y))
    b = len(pcm_list)
    pcm = np.zeros((b, max_s), np.float32)
    lengths = np.zeros((b,), np.int32)
    clips = np.zeros((b, 1, 8, 96, 96), np.uint8)
    clip_lengths = np.ones((b, 1), np.int32) * 8
    for i, y in enumerate(pcm_list):
        pcm[i, : len(y)] = y
        lengths[i] = num_frames(len(y), 400, 160)
        clips[i, 0] = load_clip(video_map[manifest.speakers[i][0].path][0])[:8]
    group_sizes = np.ones((b,), np.int32)

    fused = trainer.extract_pair_embedding(pcm, lengths, clips, clip_lengths, group_sizes)
    assert fused.shape == (b, 24 + 512)
    assert np.all(np.isfinite(fused))

    fused_head = trainer.extract_pair_embedding(
        pcm, lengths, clips, clip_lengths, group_sizes, use_fusion_head=True
    )
    assert fused_head.shape == (b, 3 * 24)


def test_bad_pair_masking(av_corpus, tmp_path):
    """Items with no video clips must not contribute to the loss."""
    manifest, video_map = av_corpus
    trainer = FusionTrainer(
        TINY_AUDIO_MODEL, TINY_VIDEO_CFG, n_spk=manifest.n_spk,
        audio_data_opts=AUDIO_DATA, mesh=make_mesh(), video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32),
        exp_root=str(tmp_path / "exp2"), log_time="f1",
    )
    trainer.init_encoders()
    state = trainer.ensure_state()
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    pcm = rng.standard_normal((8, 16000)).astype(np.float32)
    clips = rng.integers(0, 255, (8, 1, 8, 96, 96)).astype(np.uint8)
    clip_lengths = np.full((8, 1), 8, np.int32)
    labels = rng.integers(0, 3, 8).astype(np.int64)
    all_valid = np.ones((8,), np.int32)
    none_valid = np.zeros((8,), np.int32)
    _, m_all = trainer._train_step(
        trainer._init_state(), pcm, clips, clip_lengths, all_valid, labels
    )
    _, m_none = trainer._train_step(
        trainer._init_state(), pcm, clips, clip_lengths, none_valid, labels
    )
    assert float(m_none["loss"]) == 0.0
    assert float(m_all["loss"]) > 0.0


def test_fusion_lmcl_criterion(av_corpus, tmp_path):
    """The reference's LMCL fusion branch (train_fusion.py:111-116)."""
    manifest, video_map = av_corpus
    trainer = FusionTrainer(
        TINY_AUDIO_MODEL, TINY_VIDEO_CFG, n_spk=manifest.n_spk,
        audio_data_opts=AUDIO_DATA, mesh=make_mesh(), video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32),
        loss="LMCL", scale=30.0, margin=0.2,
        exp_root=str(tmp_path / "exp3"), log_time="f2",
    )
    trainer.init_encoders()
    import numpy as _np

    rng = _np.random.default_rng(2)
    pcm = rng.standard_normal((8, 16000)).astype(_np.float32)
    clips = rng.integers(0, 255, (8, 1, 8, 96, 96)).astype(_np.uint8)
    clip_lengths = _np.full((8, 1), 8, _np.int32)
    labels = rng.integers(0, 3, 8).astype(_np.int64)
    valid = _np.ones((8,), _np.int32)
    state = trainer.ensure_state()
    state, metrics = trainer._train_step(state, pcm, clips, clip_lengths, valid, labels)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("head,out_dim", [("linear", 24), ("cbp", 24)])
def test_alternate_fusion_heads(av_corpus, tmp_path, head, out_dim):
    """The reference's commented-out Linearfusion / CompactBilinearPooling
    alternates (train_fusion.py:82-84) train end-to-end."""
    manifest, video_map = av_corpus
    trainer = FusionTrainer(
        TINY_AUDIO_MODEL, TINY_VIDEO_CFG, n_spk=manifest.n_spk,
        audio_data_opts=AUDIO_DATA, mesh=make_mesh(), video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32), fusion_head=head,
        exp_root=str(tmp_path / f"exp_{head}"), log_time=f"h_{head}",
    )
    trainer.init_encoders()
    import numpy as _np

    rng = _np.random.default_rng(3)
    pcm = rng.standard_normal((8, 16000)).astype(_np.float32)
    clips = rng.integers(0, 255, (8, 1, 8, 96, 96)).astype(_np.uint8)
    clip_lengths = _np.full((8, 1), 8, _np.int32)
    labels = rng.integers(0, 3, 8).astype(_np.int64)
    valid = _np.ones((8,), _np.int32)
    state = trainer.ensure_state()
    state, metrics = trainer._train_step(state, pcm, clips, clip_lengths, valid, labels)
    trainer.state = state  # the step donated the previous state's buffers
    assert np.isfinite(float(metrics["loss"]))
    # head output reachable at extraction time too
    lengths = _np.full((8,), 60, _np.int32)
    pcm_pad = _np.zeros((8, 16000), _np.float32)
    out = trainer.extract_pair_embedding(
        pcm_pad, lengths, clips, clip_lengths, valid, use_fusion_head=True
    )
    assert out.shape == (8, out_dim)


def test_fusion_train_indivisible_batch_bf16(av_corpus, tmp_path):
    """Round-2 hygiene: a fusion batch with bs % n_devices != 0 must pad and
    shard cleanly (mirroring train/video.py), under bf16 encoder compute."""
    manifest, video_map = av_corpus
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    assert n_dev == 8  # conftest virtual mesh
    trainer = FusionTrainer(
        TINY_AUDIO_MODEL,
        TINY_VIDEO_CFG,
        n_spk=manifest.n_spk,
        audio_data_opts=AUDIO_DATA,
        mesh=mesh,
        lr=0.05,
        steps_per_epoch=2,
        video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32),
        exp_root=str(tmp_path / "exp"),
        log_time="fbf16",
        compute_dtype="bf16",
    )
    trainer.init_encoders()
    assert trainer.train_audio_model.dtype == np.dtype("bfloat16") or str(
        trainer.train_audio_model.dtype) == "bfloat16"
    pipeline = AVTrainPipeline(
        manifest, video_map, batch_size=6,  # 6 % 8 != 0 -> padded to 8
        frame_range=(40, 60), n_buckets=1, max_clips=2, clip_frames=8,
        num_workers=2,
    )
    state = trainer.train(pipeline, epochs=1)
    import jax

    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, x: a + np.abs(np.asarray(x, np.float32)).sum(),
        state.params, 0.0)))
    records = open(os.path.join(trainer.exp_dir, "fusion_metrics.jsonl")).readlines()
    assert records, "no metrics logged"
    # params stay float32 even under bf16 compute
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.asarray(leaf).dtype == np.float32


def test_video_group_embed_matches_per_clip_loop(tmp_path):
    """_video_group_embed on a dense padded (B, G, T, H, W) batch must equal
    the reference's per-clip batch-1 loop (train_fusion.py:268-275: embed
    each clip unpadded, time-mean, then group-mean) — exact ragged parity
    comes from zeroing pad frames post-transform (r3 fix,
    ops/video.py:mask_pad_frames). Also covers empty groups (bad pairs)."""
    import jax
    import jax.numpy as jnp

    from deeplip_tpu.ops import video as V

    trainer = FusionTrainer(
        TINY_AUDIO_MODEL, TINY_VIDEO_CFG, n_spk=3,
        audio_data_opts=AUDIO_DATA, mesh=make_mesh(),
        video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32), exp_root=str(tmp_path), log_time="g0",
    )
    trainer.init_encoders()

    rng = np.random.default_rng(1)
    b, g, t, hw = 3, 2, 8, 36
    clips_u8 = rng.integers(0, 256, (b, g, t, hw, hw), np.uint8)
    clip_lengths = np.array([[8, 5], [6, 0], [0, 0]], np.int32)
    group_sizes = np.array([2, 1, 0], np.int32)

    em = np.asarray(trainer._video_group_embed(
        jnp.asarray(clips_u8), jnp.asarray(clip_lengths),
        jnp.asarray(group_sizes)))

    model = trainer.video_model
    for i in range(b):
        if group_sizes[i] == 0:
            continue  # masked later by the caller's `valid`
        clip_means = []
        for j in range(group_sizes[i]):
            tj = int(clip_lengths[i, j])
            xj = V.eval_transform(
                jnp.asarray(clips_u8[i:i + 1, j, :tj]), (32, 32))[..., None]
            fj = np.asarray(model.apply(
                trainer.video_vars, xj, method=model.frame_features))
            clip_means.append(fj[0].mean(axis=0))
        ref = np.mean(clip_means, axis=0)
        np.testing.assert_allclose(em[i], ref, rtol=0, atol=2e-5)


def test_dead_head_params_receive_no_updates(tmp_path):
    """torch skips grad-None params entirely; LowFER's U/V are dead in the
    live output path (MFB overwritten, LBP.py:48-51) and must stay
    bit-frozen through optimizer steps — weight decay included (r3 fix,
    exposed by --train-parity-fusion). The gate projection (our documented
    extension for d1 != d2) IS live and must train."""
    import jax
    import jax.numpy as jnp

    trainer = FusionTrainer(
        TINY_AUDIO_MODEL, TINY_VIDEO_CFG, n_spk=3,
        audio_data_opts=AUDIO_DATA, mesh=make_mesh(), lr=0.1,
        weight_decay=1e-2,  # large wd so an unmasked decay would show
        video_hidden_dim=8, video_trunk_layers=(1, 1, 1, 1),
        crop_size=(32, 32), exp_root=str(tmp_path), log_time="m0",
    )
    mask = trainer._live_head_param_mask()
    assert mask["U"] is False and mask["V"] is False
    assert all(v for v in jax.tree_util.tree_leaves(mask["gate_proj"]))

    trainer.init_encoders()
    state = trainer.ensure_state()
    u0 = np.asarray(state.params["fusion"]["U"]).copy()
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((4, 8000)), jnp.float32)
    clips = jnp.asarray(rng.integers(0, 256, (4, 1, 6, 36, 36)), jnp.uint8)
    clip_lengths = jnp.asarray([[6], [4], [6], [5]], jnp.int32)
    group_sizes = jnp.asarray([1, 1, 1, 1], jnp.int32)
    labels = jnp.asarray([0, 1, 2, 0], jnp.int32)
    k0 = np.asarray(state.params["criterion"]["fc"]["kernel"]).copy()
    for k in range(2):
        state, _ = trainer._train_step(
            state, pcm, clips, clip_lengths, group_sizes, labels)
    assert np.array_equal(np.asarray(state.params["fusion"]["U"]), u0)
    # live params did move (vs their pre-step values — a mask regression
    # that froze EVERYTHING would leave the kernel at its nonzero init)
    assert not np.array_equal(
        np.asarray(state.params["criterion"]["fc"]["kernel"]), k0)
