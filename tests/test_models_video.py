"""Tests for the Lipreading network, TCN head, and fusion heads."""

import numpy as np
import jax
import jax.numpy as jnp

from deeplip_tpu.models.lipreading import Lipreading
from deeplip_tpu.models.tcn import MultibranchTemporalConvNet
from deeplip_tpu.models.fusion import LowFER, LinearFusion, CompactBilinearPooling

TINY_VIDEO_CFG = {
    "backbone_type": "resnet",
    "relu_type": "prelu",
    "tcn_dropout": 0.2,
    "tcn_dwpw": False,
    "tcn_kernel_size": [3, 5, 7],
    "tcn_num_layers": 2,
    "tcn_width_mult": 1,
    "width_mult": 1.0,
}


def _tiny_lipreading(num_classes=5, extract_feats=False):
    base = Lipreading.from_config(TINY_VIDEO_CFG, num_classes, extract_feats)
    # shrink the TCN for test speed
    return base.clone(hidden_dim=12, trunk_layers=(1, 1, 1, 1))


def test_lipreading_classify_shape():
    net = _tiny_lipreading(num_classes=5)
    x = jnp.ones((2, 6, 32, 32, 1))
    variables = net.init(jax.random.PRNGKey(0), x)
    logits = net.apply(variables, x, lengths=jnp.array([6, 4]))
    assert logits.shape == (2, 5)


def test_lipreading_extract_feats_shape():
    net = _tiny_lipreading(extract_feats=True)
    x = jnp.ones((2, 6, 32, 32, 1))
    variables = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(variables, x)
    assert feats.shape == (2, 6, 512)


def test_tcn_multibranch_preserves_time():
    tcn = MultibranchTemporalConvNet(num_channels=(24, 24), kernel_sizes=(3, 5, 7))
    x = jnp.ones((2, 20, 16))
    variables = tcn.init(jax.random.PRNGKey(0), x)
    out = tcn.apply(variables, x)
    assert out.shape == (2, 20, 24)


def test_masked_consensus_matches_trimmed():
    """Length-masked mean over TCN outputs == computing on the trimmed clip.

    The TCN is SAME-padded so outputs at t < L depend only weakly on frames
    beyond L... actually they do depend (centered convs look ahead), exactly
    like the reference, which also runs the TCN over the padded batch and
    only masks the consensus (model.py:16-17). So here we check the masking
    arithmetic itself on a fixed feature tensor.
    """
    from deeplip_tpu.ops.masked import length_mask

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 10, 4)), jnp.float32)
    lengths = jnp.array([10, 6])
    mask = length_mask(lengths, 10)[..., None]
    pooled = np.asarray(jnp.sum(feats * mask, axis=1) / jnp.sum(mask, axis=1))
    np.testing.assert_allclose(pooled[1], np.asarray(feats)[1, :6].mean(0), atol=1e-6)


def test_lowfer_gated_concat_semantics():
    """Output must be [e1, σ(e2), σ(e2)⊙e1] (live path of LBP.py:48-50)."""
    head = LowFER(input_dims=(8, 8), k=4, output_dim=6)
    rng = np.random.default_rng(1)
    e1 = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), e1, e2)
    out = np.asarray(head.apply(variables, e1, e2))
    sig = 1.0 / (1.0 + np.exp(-np.asarray(e2)))
    want = np.concatenate([np.asarray(e1), sig, sig * np.asarray(e1)], axis=1)
    np.testing.assert_allclose(out, want, atol=1e-6)
    assert out.shape == (3, 24)


def test_lowfer_mfb_branch():
    head = LowFER(input_dims=(8, 8), k=4, output_dim=6)
    rng = np.random.default_rng(2)
    e1 = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), e1, e2)
    mfb = head.apply(variables, e1, e2, method=head.mfb)
    assert mfb.shape == (3, 6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(mfb), axis=1), 1.0, atol=1e-5)
    # manual recompute with the same params
    u = np.asarray(variables["params"]["U"])
    v = np.asarray(variables["params"]["V"])
    x = (np.asarray(e1) @ u) * (np.asarray(e2) @ v)
    x = x.reshape(3, 6, 4).mean(-1)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(mfb), x, atol=1e-5)


def test_linear_fusion_extract_switch():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 20)), jnp.float32)
    head = LinearFusion(hidden_size=16)
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out.shape == (4, 16)
    head_e = LinearFusion(hidden_size=16, extract_feats=True)
    hid = head_e.apply(variables, x)
    assert hid.shape == (4, 16)


def test_compact_bilinear_pooling_approximates_inner_product():
    """Count-sketch property: <CBP(a,b), CBP(c,d)> ≈ <a,c>·<b,d>."""
    cbp = CompactBilinearPooling(output_dim=2048)
    rng = np.random.default_rng(4)
    a, b, c, d = (jnp.asarray(rng.standard_normal((1, 64)), jnp.float32) for _ in range(4))
    variables = cbp.init(jax.random.PRNGKey(0), a, b)
    pab = np.asarray(cbp.apply(variables, a, b))[0]
    pcd = np.asarray(cbp.apply(variables, c, d))[0]
    got = float(pab @ pcd)
    want = float((a @ c.T)[0, 0]) * float((b @ d.T)[0, 0])
    # statistical approximation — loose bound scaled by the magnitudes
    scale = np.linalg.norm(np.asarray(a)) * np.linalg.norm(np.asarray(b)) * \
        np.linalg.norm(np.asarray(c)) * np.linalg.norm(np.asarray(d))
    assert abs(got - want) < 0.35 * scale


def test_avg_pool_downsample_odd_dims_ceil_mode():
    """The avg-pool downsample variant must ceil odd spatial dims like torch
    AvgPool2d(ceil_mode=True) (reference resnet.py:13-21) so the residual
    matches the stride-2 conv branch (r2 review: VALID pooling shape-crashed
    on the standard 88x88 pipeline's 11x11 stage)."""
    from deeplip_tpu.models.resnet import ResNetTrunk

    trunk = ResNetTrunk(layers=(1, 1, 1, 1), relu_type="relu",
                        avg_pool_downsample=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 11, 11, 64)),
                    jnp.float32)
    variables = trunk.init(jax.random.PRNGKey(0), x, train=False)
    out = trunk.apply(variables, x, train=False)
    assert out.shape == (2, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_frontend_conv3d_s2d_matches_direct():
    """The space-to-depth frontend conv (ops/video.py:frontend_conv3d_s2d)
    must reproduce the direct Conv3D 64x(5,7,7)/stride(1,2,2)/pad(2,3,3)
    lowering exactly up to f32 summation order, for both even-H/W geometries
    (88x88 mouth ROI and 96x96 raw clips)."""
    from deeplip_tpu.ops.video import frontend_conv3d_s2d

    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.standard_normal((5, 7, 7, 1, 64)) * 0.05,
                         jnp.float32)
    for hw in (88, 96):
        x = jnp.asarray(rng.standard_normal((2, 7, hw, hw, 1)), jnp.float32)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        want = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 2, 2),
            padding=[(2, 2), (3, 3), (3, 3)], dimension_numbers=dn)
        got = frontend_conv3d_s2d(kernel, x)
        assert got.shape == want.shape == (2, 7, hw // 2, hw // 2, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)


def test_lipreading_frontend_odd_hw_fallback():
    """Odd spatial dims can't space-to-depth by 2; the FrontendConv3D module
    must fall back to the direct lowering and still match shapes."""
    from deeplip_tpu.models.lipreading import FrontendConv3D

    mod = FrontendConv3D(64)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 5, 87, 87, 1)),
                    jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == (1, 5, 44, 44, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_tcn_dwpw_train_and_eval_modes():
    """dwpw (depthwise-separable) TCN: train mode (padded-length BN stats,
    r3 ConvBatchRelu restructure) and eval mode (centered SAME) both run
    and agree in shape; eval uses running stats so values differ from
    train by the BN mode only."""
    from deeplip_tpu.models.tcn import TemporalConvNet

    net = TemporalConvNet((8, 8), kernel_size=3, dropout=0.0,
                          relu_type="prelu", dwpw=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 7, 6)),
                    jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    y_eval = net.apply(v, x, train=False)
    y_train, upd = net.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert y_eval.shape == y_train.shape == (2, 7, 8)
    assert np.isfinite(np.asarray(y_eval)).all()
    assert np.isfinite(np.asarray(y_train)).all()
    # train mode must have updated the running stats
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(v["batch_stats"]),
                        jax.tree_util.tree_leaves(upd["batch_stats"])))
    assert changed


def test_multibranch_tcn_deep_dilation_train_mode():
    """Multibranch [3,5,7] with 4 levels (dilation up to 8): the train-mode
    padded conv works even when the pad (k-1)*d = 48 exceeds T, and
    gradients flow."""
    from deeplip_tpu.models.tcn import MultibranchTemporalConvNet

    net = MultibranchTemporalConvNet((6, 6, 6, 6), (3, 5, 7), 0.0,
                                     "prelu", False)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 9, 4)),
                    jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)

    def loss(p):
        y, _ = net.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                         train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


def test_padded_batch_frame_features_equal_per_clip():
    """Ragged-batch parity (r3 fix): with pad frames zeroed AFTER the
    transform (ops/video.py:mask_pad_frames), a padded batch's frame
    features equal per-clip unpadded extraction exactly — a zeroed pad
    frame contributes what the frontend conv's own temporal zero padding
    would (the reference embeds clips unpadded at batch 1,
    train_fusion.py:268-274). Before the fix, pad frames carried
    (0/255-mean)/std = -2.55 and leaked into the last 2 valid frames."""
    from deeplip_tpu.ops import video as V

    net = _tiny_lipreading(extract_feats=True)
    rng = np.random.default_rng(0)
    t_max, hw = 9, 36
    clips_u8 = rng.integers(0, 256, (3, t_max, hw, hw), np.uint8)
    lengths = np.array([9, 5, 7], np.int32)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 2, 32, 32, 1), jnp.float32))

    x = V.eval_transform(jnp.asarray(clips_u8), (32, 32))[..., None]
    x = V.mask_pad_frames(x, jnp.asarray(lengths))
    feats_pad = np.asarray(net.apply(variables, x, method=net.frame_features))

    for i, t in enumerate(lengths):
        xi = V.eval_transform(jnp.asarray(clips_u8[i:i + 1, :t]), (32, 32))[..., None]
        fi = np.asarray(net.apply(variables, xi, method=net.frame_features))
        np.testing.assert_allclose(feats_pad[i, :t], fi[0], rtol=0, atol=2e-5)
