"""Lipreading network: 3D-conv frontend → per-frame 2D trunk → TCN head.

Rebuilds ``models/video_models/model.py`` TPU-first. Input is channel-last
``(B, T, H, W, 1)`` (NDHWC — XLA's native 3D-conv layout), vs the reference's
``(B, 1, T, H, W)``:

- frontend3D (``model.py:81-85``): Conv3D 64×(5,7,7)/stride(1,2,2)/pad
  (2,3,3) no bias → BN → PReLU → MaxPool3D (1,3,3)/stride(1,2,2)/pad(0,1,1);
- time folded into batch for the 2D trunk (``threeD_to_2D_tensor``,
  ``model.py:9-13``) — a free reshape in NDHWC since T is already adjacent
  to batch, where the reference needs a transpose;
- trunk: ResNet-18 (``model.py:71``) or ShuffleNetV2 (``model.py:72-78``);
- head: multiscale multibranch TCN over ``(B, T, C)`` with a length-masked
  mean consensus (``_average_batch``, ``model.py:16-17``) and a final Dense
  to speaker classes;
- ``extract_feats=True`` short-circuits after the trunk and returns the
  ``(B, T, backend_out)`` per-frame features (``model.py:104-105``).

Because the frontend's temporal conv is SAME-padded (pad 2 for kernel 5),
``T_out == T`` and frame validity masks carry through unchanged. Ragged
batches achieve EXACT per-clip parity when pad frames are zeroed after the
pixel transform (``ops/video.py:mask_pad_frames``, applied by every
trainer call site): a zero pad frame contributes exactly what the conv's
own temporal zero padding would, so a padded batch's frame features equal
the reference's unpadded batch-1 extraction
(``tests/test_models_video.py::test_padded_batch_frame_features_equal_per_clip``).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplip_tpu.models.resnet import PReLU, ResNetTrunk
from deeplip_tpu.models.shufflenetv2 import ShuffleNetV2Trunk
from deeplip_tpu.models.tcn import MultibranchTemporalConvNet, TemporalConvNet
from deeplip_tpu.ops.masked import length_mask
from deeplip_tpu.ops.video import frontend_conv3d_s2d
from deeplip_tpu.models.norm import TorchBatchNorm


class FrontendConv3D(nn.Module):
    """The frontend Conv3D — ``features``×(5,7,7), stride (1,2,2), pad
    (2,3,3), no bias (reference ``models/video_models/model.py:81-85``) —
    with a space-to-depth fast path.

    Declares the SAME single ``kernel`` param (DHWIO, lecun-normal) as the
    ``nn.Conv`` it replaces, so checkpoints, torch import, and init are
    unchanged. When the input's H and W are even (always, for the 88×88 /
    96×96 mouth-ROI crops), the conv is computed via
    :func:`deeplip_tpu.ops.video.frontend_conv3d_s2d` — identical
    arithmetic up to f32 summation order, measured 2.4× faster fwd+bwd on
    TPU (19%→46% MFU, ``benchmarks/conv3d_probe.py``) because the direct
    1-input-channel stride-2 form starves the MXU (r3 attribution,
    ``benchmarks/video_attribution.py``). Odd H/W falls back to the
    direct lowering.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (5, 7, 7, 1, self.features), jnp.float32)
        x = x.astype(self.dtype)
        if x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            return frontend_conv3d_s2d(kernel, x)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 2, 2),
            padding=[(2, 2), (3, 3), (3, 3)], dimension_numbers=dn)


class Lipreading(nn.Module):
    num_classes: int = 500
    hidden_dim: int = 256
    backbone_type: str = "resnet"
    relu_type: str = "prelu"
    width_mult: float = 1.0
    tcn_kernel_sizes: tuple[int, ...] = (3, 5, 7)
    tcn_num_layers: int = 4
    tcn_dropout: float = 0.2
    tcn_dwpw: bool = False
    tcn_width_mult: int = 1
    extract_feats: bool = False
    dtype: jnp.dtype = jnp.float32
    trunk_layers: tuple[int, ...] = (2, 2, 2, 2)  # ResNet-18 default

    @classmethod
    def from_config(cls, cfg: Mapping[str, Any], num_classes: int, extract_feats: bool = False):
        """Build from the video JSON config (``conf/video_config.json``)."""
        return cls(
            num_classes=num_classes,
            backbone_type=cfg.get("backbone_type", "resnet"),
            relu_type=cfg.get("relu_type", "prelu"),
            width_mult=float(cfg.get("width_mult", 1.0)),
            tcn_kernel_sizes=tuple(cfg.get("tcn_kernel_size", (3, 5, 7))),
            tcn_num_layers=int(cfg.get("tcn_num_layers", 4)),
            tcn_dropout=float(cfg.get("tcn_dropout", 0.2)),
            tcn_dwpw=bool(cfg.get("tcn_dwpw", False)),
            tcn_width_mult=int(cfg.get("tcn_width_mult", 1)),
            extract_feats=extract_feats,
        )

    @property
    def backend_out(self) -> int:
        if self.backbone_type == "resnet":
            return 512
        if self.backbone_type == "shufflenet":
            return 2048 if self.width_mult == 2.0 else 1024
        raise ValueError(f"backbone {self.backbone_type!r}")

    def setup(self):
        frontend_nout = 64 if self.backbone_type == "resnet" else 24
        self.frontend_conv = FrontendConv3D(
            frontend_nout, dtype=self.dtype, name="frontend_conv")
        self.frontend_bn = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                        name="frontend_bn")
        self.frontend_act = PReLU(name="frontend_prelu") if self.relu_type == "prelu" else nn.relu
        if self.backbone_type == "resnet":
            self.trunk = ResNetTrunk(layers=self.trunk_layers, relu_type=self.relu_type,
                                     dtype=self.dtype, name="trunk")
        elif self.backbone_type == "shufflenet":
            self.trunk = ShuffleNetV2Trunk(width_mult=self.width_mult, name="trunk")
        else:
            raise ValueError(f"backbone {self.backbone_type!r}")
        tcn_ch = self.hidden_dim * len(self.tcn_kernel_sizes) * self.tcn_width_mult
        num_channels = (tcn_ch,) * self.tcn_num_layers
        if len(self.tcn_kernel_sizes) == 1:
            self.tcn = TemporalConvNet(
                num_channels, self.tcn_kernel_sizes[0], self.tcn_dropout,
                self.relu_type, self.tcn_dwpw, name="tcn",
            )
        else:
            self.tcn = MultibranchTemporalConvNet(
                num_channels, tuple(self.tcn_kernel_sizes), self.tcn_dropout,
                self.relu_type, self.tcn_dwpw, name="tcn",
            )
        self.tcn_output = nn.Dense(self.num_classes, name="tcn_output")

    def frame_features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """``(B, T, H, W, 1) -> (B, T, backend_out)`` per-frame embeddings."""
        b, t = x.shape[0], x.shape[1]
        x = self.frontend_conv(x.astype(self.dtype))
        x = self.frontend_bn(x, use_running_average=not train)
        x = self.frontend_act(x)
        # XLA's reduce_window/SelectAndScatter is the best lowering here: a
        # hand-written equality-routing VJP measured 1.75x SLOWER standalone
        # and recovers only ~2 ms (noise floor) of the +36 ms pool/trunk
        # composition gap when composed (benchmarks/video_attribution.py
        # maxpool vs maxpool_vjp, pool_trunk vs poolvjp_trunk, r3)
        x = nn.max_pool(
            x, window_shape=(1, 3, 3), strides=(1, 2, 2),
            padding=[(0, 0), (1, 1), (1, 1)],
        )
        # fold time into batch: NDHWC -> (B*T, H, W, C) is a pure reshape
        bt_frames = x.reshape((b * t,) + x.shape[2:])
        feats = self.trunk(bt_frames, train=train)
        return feats.reshape(b, t, -1)

    def __call__(self, x: jnp.ndarray, lengths=None, train: bool = False):
        feats = self.frame_features(x, train=train)
        if self.extract_feats:
            return feats
        return self.classify(feats, lengths=lengths, train=train)

    def classify(self, feats: jnp.ndarray, lengths=None, train: bool = False):
        """TCN + masked mean consensus + classifier over frame features."""
        out = self.tcn(feats, train=train)
        if lengths is None:
            pooled = jnp.mean(out, axis=1)
        else:
            mask = length_mask(lengths, out.shape[1], dtype=out.dtype)[..., None]
            pooled = jnp.sum(out * mask, axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1), 1.0
            )
        return self.tcn_output(pooled)
