"""ResNet-18-style 2D trunk for the lipreading network (Flax, NHWC).

Rebuilds ``models/video_models/resnet.py`` TPU-first: NHWC layout (XLA's
native conv layout on TPU — channels on the 128-lane axis), no stem (the 3D
frontend of :class:`deeplip_tpu.models.lipreading.Lipreading` replaces
conv1/maxpool, as in the reference where ``ResNet`` starts at ``layer1``,
``resnet.py:81``), BasicBlocks [2, 2, 2, 2] with stride 1/2/2/2, per-channel
PReLU or ReLU, 1x1-conv downsampling (or the avg-pool variant of
``downsample_basic_block_v2``), and a global average pool to ``(B, 512)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from deeplip_tpu.models.norm import TorchBatchNorm


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)`` semantics)."""

    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, self.init_alpha, jnp.float32), (x.shape[-1],)
        )
        # keep the activation in the input's compute dtype (params stay f32)
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def _relu_layer(relu_type: str):
    if relu_type == "relu":
        return lambda name: nn.relu
    if relu_type == "prelu":
        return lambda name: PReLU(name=name)
    raise ValueError(f"relu type {relu_type!r} not implemented")


class BasicBlock(nn.Module):
    """conv3x3-BN-act-conv3x3-BN + (optional downsample) residual."""

    planes: int
    stride: int = 1
    relu_type: str = "prelu"
    avg_pool_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        make_act = _relu_layer(self.relu_type)
        needs_down = self.stride != 1 or x.shape[-1] != self.planes
        residual = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = make_act("relu1")(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2"
        )(out)
        out = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        if needs_down:
            if self.avg_pool_downsample:
                # torch AvgPool2d(ceil_mode=True) (reference resnet.py:21):
                # odd dims round UP so the residual matches the stride-2
                # conv branch; edge windows average only in-bounds pixels
                pad_h = -residual.shape[1] % self.stride
                pad_w = -residual.shape[2] % self.stride
                residual = nn.avg_pool(
                    residual,
                    (self.stride, self.stride),
                    strides=(self.stride, self.stride),
                    padding=((0, pad_h), (0, pad_w)),
                    count_include_pad=False,
                )
                residual = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            else:
                residual = nn.Conv(
                    self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="down_conv",
                )(residual)
            residual = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="down_bn"
            )(residual)
        out = out + residual
        act2 = make_act("relu2")
        return act2(out)


class ResNetTrunk(nn.Module):
    """Stemless ResNet: ``(B, H, W, C) -> (B, 512)``."""

    layers: tuple[int, ...] = (2, 2, 2, 2)
    relu_type: str = "prelu"
    avg_pool_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        x = x.astype(self.dtype)
        for stage, (p, s, n) in enumerate(zip(planes, strides, self.layers), start=1):
            for i in range(n):
                x = BasicBlock(
                    planes=p,
                    stride=s if i == 0 else 1,
                    relu_type=self.relu_type,
                    avg_pool_downsample=self.avg_pool_downsample,
                    dtype=self.dtype,
                    name=f"layer{stage}_block{i}",
                )(x, train=train)
        # pool in >= float32 (bf16 mean over 22x22 loses precision; f64
        # inputs keep f64 — the video train-parity harness runs doubles)
        return jnp.mean(
            x.astype(jnp.promote_types(x.dtype, jnp.float32)), axis=(1, 2)
        )  # AdaptiveAvgPool2d(1)
