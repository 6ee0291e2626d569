"""2D-CNN speaker embedding network (the audio ``resnet`` arch variant).

The reference selects ``models.resnet.SpeakerEmbNet`` for ``arch: resnet``
(``train_audio.py:64-66``) and feeds it features with a singleton channel
(``inputs_feat.unsqueeze(1)``, ``train_audio.py:183-184``), but the module
itself is missing from the release. This implementation follows the shipped
config contract (``conf/audio_config.yaml:93-102``): ``input_dim: 1``
channel, stage widths ``hidden_dim: [64, 128, 256]`` with
``residual_block_layers: [3, 3, 3]`` BasicBlocks, average pooling, one FC
layer to ``embedding_dim: 256`` — a standard spectrogram-ResNet x-vector.

Same interface as :class:`deeplip_tpu.models.tdnn.SpeakerEmbNet`:
``extract_embedding`` returns ``(xv, x_a)`` and ``__call__`` the training
output. Input is ``(B, T, D)`` features; internally an NHWC image with the
feature dim as width.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax.numpy as jnp

from deeplip_tpu.models.resnet import BasicBlock
from deeplip_tpu.ops.masked import length_mask
from deeplip_tpu.models.norm import TorchBatchNorm


class AudioResNet(nn.Module):
    stage_widths: tuple[int, ...] = (64, 128, 256)
    stage_blocks: tuple[int, ...] = (3, 3, 3)
    embedding_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, model_opts: Mapping[str, Any]) -> "AudioResNet":
        opts = model_opts["resnet"]
        return cls(
            stage_widths=tuple(opts.get("hidden_dim", (64, 128, 256))),
            stage_blocks=tuple(opts.get("residual_block_layers", (3, 3, 3))),
            embedding_dim=int(opts.get("embedding_dim", 256)),
        )

    # interface parity with SpeakerEmbNet (conv stack is SAME-padded)
    @property
    def receptive_field(self) -> int:
        return 1

    def valid_lengths(self, lengths):
        return lengths

    def setup(self):
        self.stem = nn.Conv(self.stage_widths[0], (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False, dtype=self.dtype, name="stem")
        self.stem_bn = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                    name="stem_bn")
        blocks = []
        for stage, (w, n) in enumerate(zip(self.stage_widths, self.stage_blocks)):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                blocks.append(
                    BasicBlock(planes=w, stride=stride, relu_type="relu",
                               dtype=self.dtype, name=f"stage{stage}_block{i}")
                )
        self.blocks = blocks
        self.fc1 = nn.Dense(self.embedding_dim)
        self.bn1 = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
        self.fc2 = nn.Dense(self.embedding_dim)
        self.bn2 = TorchBatchNorm(momentum=0.9, epsilon=1e-5)

    def _trunk(self, x: jnp.ndarray, train: bool, lengths) -> jnp.ndarray:
        b, t, d = x.shape
        img = x.astype(self.dtype)[..., None]  # NHWC with H=T, W=D, C=1
        h = self.stem(img)
        h = nn.relu(self.stem_bn(h, use_running_average=not train))
        for blk in self.blocks:
            h = blk(h, train=train)
        # masked global average pool over (T', D'), in float32
        h = h.astype(jnp.float32)
        if lengths is None:
            return jnp.mean(h, axis=(1, 2))
        # time downsampled by 4 across stages 1-2
        t_out = h.shape[1]
        scale = t / t_out
        valid = jnp.maximum(jnp.ceil(lengths.astype(jnp.float32) / scale), 1.0)
        mask = length_mask(valid.astype(jnp.int32), t_out, h.dtype)[:, :, None, None]
        return jnp.sum(h * mask, axis=(1, 2)) / (
            jnp.maximum(valid, 1.0)[:, None] * h.shape[2]
        )

    def extract_embedding(self, x, train: bool = False, lengths=None):
        pooled = self._trunk(x, train, lengths)
        x_a = self.fc1(pooled)
        h = nn.leaky_relu(self.bn1(x_a, use_running_average=not train), 0.2)
        xv = self.fc2(h)
        return xv, x_a

    def __call__(self, x, train: bool = False, lengths=None):
        xv, _ = self.extract_embedding(x, train=train, lengths=lengths)
        return nn.leaky_relu(self.bn2(xv, use_running_average=not train), 0.2)
