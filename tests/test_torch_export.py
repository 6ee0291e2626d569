"""deeplip→torch export: strict-load + forward parity + round-trips.

The export layer (interop/torch_export.py) is the inverse of the importers:
every test here proves one of (a) a torch net built with the reference
state_dict layout loads the export with ``strict=True`` and computes the
same function, or (b) export→import round-trips bit-equal.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_interop import _torch_reference_tdnn
from tests.test_video_import import _torch_lipreading_frontend_trunk

CONTEXTS = [[-2, -1, 0, 1, 2], [-2, 0, 2], [-3, 0, 3], [0], [0]]
DIMS = [24, 64, 64, 64, 64, 128]
EMB = 32


def _randomized_stats(stats, seed=7):
    """Random BN running stats so eval normalization is non-trivial."""
    rng = np.random.default_rng(seed)
    flat, tree = jax.tree_util.tree_flatten_with_path(stats)
    out = []
    for path, leaf in flat:
        if "var" in str(path[-1]):
            out.append(rng.uniform(0.5, 2.0, leaf.shape).astype(np.float32))
        else:
            out.append(rng.normal(0, 0.3, leaf.shape).astype(np.float32))
    return jax.tree_util.tree_unflatten(tree, out)


def _init_audio_model():
    from deeplip_tpu.models.tdnn import SpeakerEmbNet

    model = SpeakerEmbNet(
        contexts=tuple(tuple(c) for c in CONTEXTS),
        hidden_dims=tuple(DIMS[1:]),
        embedding_dim=EMB,
        pooling="statistic",
    )
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 50, DIMS[0])))
    return model, variables["params"], _randomized_stats(variables["batch_stats"])


def test_audio_export_strict_load_forward_parity():
    """Torch net strict-loads the export and computes the same embedding."""
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_export import export_speaker_embnet_state_dict

    model, params, stats = _init_audio_model()
    sd = export_speaker_embnet_state_dict(params, stats)
    tnet = _torch_reference_tdnn(torch, CONTEXTS, DIMS, EMB)
    tnet.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}, strict=True)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((3, 80, DIMS[0])).astype(np.float32)
    with torch.no_grad():
        want = tnet.extract(torch.tensor(x).transpose(1, 2)).numpy()
    got, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), method=model.extract_embedding)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_audio_export_import_roundtrip_bit_equal():
    from deeplip_tpu.interop.torch_export import export_speaker_embnet_state_dict
    from deeplip_tpu.interop.torch_import import import_speaker_embnet_state_dict

    _, params, stats = _init_audio_model()
    sd = export_speaker_embnet_state_dict(params, stats)
    params2, stats2 = import_speaker_embnet_state_dict(sd, n_blocks=5)
    for want, got in ((params, params2), (stats, stats2)):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            want, got)


def test_audio_checkpoint_save_load(tmp_path):
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_export import save_reference_audio_checkpoint
    from deeplip_tpu.interop.torch_import import load_reference_audio_checkpoint

    _, params, stats = _init_audio_model()
    rng = np.random.default_rng(3)
    crit = {"weights": rng.standard_normal((7, EMB)).astype(np.float32)}
    path = str(tmp_path / "net_4.pth")
    save_reference_audio_checkpoint(path, params, stats, epoch=4,
                                    criterion_params=crit)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    # the reference container keys (train_audio.py:261-264); optimizer must
    # exist because the reference model_average reads it
    assert ckpt["epoch"] == 4 and "optimizer" in ckpt
    np.testing.assert_array_equal(
        ckpt["criterion_state_dict"]["weights"].numpy(), crit["weights"])

    params2, stats2 = load_reference_audio_checkpoint(path, n_blocks=5)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 params, params2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 stats, stats2)


def test_mono_head_pooling_layout_roundtrip():
    """mono_head export re-adds the reference broadcast axes; import strips
    them back (pooling.py:34-37 layout)."""
    from deeplip_tpu.interop.torch_export import export_speaker_embnet_state_dict
    from deeplip_tpu.interop.torch_import import import_speaker_embnet_state_dict

    _, params, stats = _init_audio_model()
    rng = np.random.default_rng(5)
    pool = {
        "W": rng.standard_normal((16, DIMS[-1])).astype(np.float32),
        "b": rng.standard_normal((16, 1)).astype(np.float32),
        "v": rng.standard_normal((1, 16)).astype(np.float32),
        "k": rng.standard_normal((1, 1)).astype(np.float32),
    }
    params = {**params, "pool": pool}
    sd = export_speaker_embnet_state_dict(params, stats,
                                          pooling="mono_head_attention")
    assert sd["pooling.W"].shape == (1, 16, DIMS[-1])
    assert sd["pooling.b"].shape == (1, 16, 1)
    assert sd["pooling.v"].shape == (1, 1, 16)
    assert sd["pooling.k"].shape == (1, 1, 1)
    params2, _ = import_speaker_embnet_state_dict(sd, n_blocks=5)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 pool, params2["pool"])


def _init_video_model():
    from deeplip_tpu.models.lipreading import Lipreading

    model = Lipreading(num_classes=4)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 2, 32, 32, 1)))
    return model, variables["params"], _randomized_stats(variables["batch_stats"])


def test_video_export_strict_load_frame_feature_parity():
    """Torch frontend+trunk net strict-loads the export's non-TCN subset and
    computes the same frame features."""
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_export import export_lipreading_state_dict

    model, params, stats = _init_video_model()
    sd = export_lipreading_state_dict(params, stats)
    sub = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items() if not k.startswith("tcn.")}
    tnet = _torch_lipreading_frontend_trunk(torch)
    tnet.load_state_dict(sub, strict=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 48, 48)).astype(np.float32)
    with torch.no_grad():
        want = tnet.frame_features(torch.tensor(x)[:, None]).numpy()
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x)[..., None], method=model.frame_features)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_video_export_import_roundtrip_bit_equal():
    """Full export (incl. multibranch TCN + classifier) round-trips."""
    from deeplip_tpu.interop.torch_export import export_lipreading_state_dict
    from deeplip_tpu.interop.torch_import import import_lipreading_state_dict

    _, params, stats = _init_video_model()
    sd = export_lipreading_state_dict(params, stats)
    params2, stats2 = import_lipreading_state_dict(sd)
    # the import covers exactly the exported subtrees
    for sub in ("frontend_conv", "frontend_bn", "frontend_prelu", "trunk",
                "tcn", "tcn_output"):
        assert sub in params2, sub
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            params[sub], params2[sub])
    for sub in ("frontend_bn", "trunk", "tcn"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            stats[sub], stats2[sub])


def test_video_checkpoint_save_load(tmp_path):
    pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_export import save_reference_video_checkpoint
    from deeplip_tpu.interop.torch_import import load_reference_video_checkpoint

    _, params, stats = _init_video_model()
    path = str(tmp_path / "video_3.pt")
    save_reference_video_checkpoint(path, params, stats,
                                    data_parallel_prefix=True)
    params2, stats2 = load_reference_video_checkpoint(path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 params["trunk"], params2["trunk"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 stats["trunk"], stats2["trunk"])


def test_fusion_checkpoint_save_load(tmp_path):
    pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_export import save_reference_fusion_checkpoint
    from deeplip_tpu.interop.torch_import import load_reference_fusion_checkpoint

    rng = np.random.default_rng(9)
    head = {"U": rng.standard_normal((512, 1024)).astype(np.float32),
            "V": rng.standard_normal((512, 1024)).astype(np.float32)}
    crit = {"fc": {"kernel": rng.standard_normal((1536, 6)).astype(np.float32),
                   "bias": rng.standard_normal((6,)).astype(np.float32)}}
    path = str(tmp_path / "net_avg.pth")
    save_reference_fusion_checkpoint(path, head, epoch=2,
                                     criterion_params=crit)
    head2, crit2 = load_reference_fusion_checkpoint(path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 head, head2)
    np.testing.assert_array_equal(crit2["fc"]["kernel"], crit["fc"]["kernel"])
    np.testing.assert_array_equal(crit2["fc"]["bias"], crit["fc"]["bias"])


def test_shufflenet_export_strict_load_and_roundtrip():
    """ShuffleNetV2 trunk export: torch strict-load + forward parity, and
    export->import bit-equal round-trip."""
    torch = pytest.importorskip("torch")
    import deeplip_tpu.models.shufflenetv2 as sv2
    from deeplip_tpu.interop.torch_export import export_shufflenet_trunk_state_dict
    from deeplip_tpu.interop.torch_import import import_shufflenet_trunk_state_dict
    from deeplip_tpu.models.shufflenetv2 import ShuffleNetV2Trunk
    from tests.test_shufflenet_import import _torch_shufflenet_trunk

    widths = (16, 32, 64, 48)
    orig = sv2._STAGE_CHANNELS[1.0]
    sv2._STAGE_CHANNELS[1.0] = widths
    try:
        model = ShuffleNetV2Trunk(width_mult=1.0)
        variables = model.init(jax.random.PRNGKey(4),
                               jnp.zeros((1, 24, 24, 24)))
        params = variables["params"]
        stats = _randomized_stats(variables["batch_stats"], seed=13)

        sd = export_shufflenet_trunk_state_dict(params, stats)
        tnet = _torch_shufflenet_trunk(torch, widths)
        tnet.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                              for k, v in sd.items()}, strict=True)

        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 24, 24, 24)).astype(np.float32)  # NHWC
        with torch.no_grad():
            want = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

        params2, stats2 = import_shufflenet_trunk_state_dict(sd)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            dict(params), params2)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            dict(stats), stats2)
    finally:
        sv2._STAGE_CHANNELS[1.0] = orig
