"""ShuffleNetV2 trunk (alternative lightweight lipreading backbone), Flax/NHWC.

Rebuilds the trunk portion of ``models/video_models/shufflenetv2.py`` that
the Lipreading net actually uses (``model.py:72-78``): the staged inverted
residual blocks + the final 1x1 conv + global pooling. The stem conv/maxpool
are omitted because the 3D frontend replaces them (the reference wires
``shufflenet.features`` onward, not ``conv1``).

Stage widths follow the reference's width-multiplier table
(``shufflenetv2.py:117-129``): 0.5→(48, 96, 192, 1024), 1.0→(116, 232, 464,
1024), 1.5→(176, 352, 704, 1024), 2.0→(244, 488, 976, 2048), with stage
repeats (4, 8, 4).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from deeplip_tpu.models.norm import TorchBatchNorm

_STAGE_CHANNELS = {
    0.5: (48, 96, 192, 1024),
    1.0: (116, 232, 464, 1024),
    1.5: (176, 352, 704, 1024),
    2.0: (244, 488, 976, 2048),
}
_STAGE_REPEATS = (4, 8, 4)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """Interleave channel groups: ``(..., C) -> (..., C)`` shuffled."""
    *lead, c = x.shape
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


def _conv_bn(x, features, kernel, stride, groups, act, train, name_prefix):
    pad = (kernel - 1) // 2
    x = nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], feature_group_count=groups,
        use_bias=False, name=f"{name_prefix}_conv",
    )(x)
    x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     name=f"{name_prefix}_bn")(x)
    return nn.relu(x) if act else x


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit; ``stride=1`` splits channels, ``stride=2`` downsamples."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b = _conv_bn(x2, half, 1, 1, 1, True, train, "pw1")
            b = _conv_bn(b, half, 3, 1, half, False, train, "dw")
            b = _conv_bn(b, half, 1, 1, 1, True, train, "pw2")
            out = jnp.concatenate([x1, b], axis=-1)
        else:
            left = _conv_bn(x, x.shape[-1], 3, self.stride, x.shape[-1], False, train, "l_dw")
            left = _conv_bn(left, half, 1, 1, 1, True, train, "l_pw")
            right = _conv_bn(x, half, 1, 1, 1, True, train, "r_pw1")
            right = _conv_bn(right, half, 3, self.stride, half, False, train, "r_dw")
            right = _conv_bn(right, half, 1, 1, 1, True, train, "r_pw2")
            out = jnp.concatenate([left, right], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Trunk(nn.Module):
    """``(B, H, W, C) -> (B, backend_out)`` staged trunk + conv_last + pool."""

    width_mult: float = 1.0

    @property
    def backend_out(self) -> int:
        return _STAGE_CHANNELS[self.width_mult][-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chans = _STAGE_CHANNELS[self.width_mult]
        for stage, (c, reps) in enumerate(zip(chans[:-1], _STAGE_REPEATS), start=2):
            for i in range(reps):
                x = InvertedResidual(
                    features=c, stride=2 if i == 0 else 1,
                    name=f"stage{stage}_unit{i}",
                )(x, train=train)
        x = _conv_bn(x, chans[-1], 1, 1, 1, True, train, "conv_last")
        return jnp.mean(x, axis=(1, 2))
