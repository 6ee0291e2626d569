"""Temporal Convolutional Network head (single- and multi-branch) in Flax.

Rebuilds ``models/video_models/tcn.py`` time-major ``(B, T, C)``:

- The reference pads each Conv1d by ``(k-1)*d`` on both sides and then
  symmetrically chomps ``(k-1)*d`` total — AFTER BatchNorm (``Chomp1d``
  with ``symm_chomp``, ``tcn.py:12-25,49``). For the conv math and
  eval-mode BN that composition is exactly a centered SAME convolution,
  so the eval path convolves once with ``(k-1)*d/2`` padding per side.
  Train mode reproduces torch's batch statistics exactly — BN over the
  unchomped ``T+(k-1)*d`` positions, then the chomp (see
  :class:`ConvBatchRelu`; proven by ``scripts/parity_check.py
  --train-parity-video``).
- ``MultibranchTemporalBlock`` (``tcn.py:64-116``): parallel branches with
  kernel sizes [3, 5, 7], each producing ``n_outputs/num_kernels`` channels,
  concatenated; two such multi-branch layers with dropout; residual with a
  1x1 conv. The reference instantiates the 1x1 whenever
  ``n_inputs//num_kernels != n_outputs`` (``tcn.py:87``) — which is true for
  every layer of the shipped config — and we keep that exact condition for
  checkpoint-shape parity.
- ``TemporalBlock`` (``tcn.py:145-224``): the standard two-conv residual
  block; ``dwpw`` selects depthwise-separable convs (via
  ``feature_group_count``) like the reference's dw/pw stacks.
- Dropout uses the ``'dropout'`` RNG collection when ``train=True``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from deeplip_tpu.models.resnet import PReLU
from deeplip_tpu.models.norm import TorchBatchNorm


def _act(relu_type: str, name: str):
    if relu_type == "relu":
        return nn.relu
    if relu_type == "prelu":
        return PReLU(name=name)
    raise ValueError(f"relu type {relu_type!r}")


class ConvBatchRelu(nn.Module):
    """Dilated conv + BN + activation == the reference's
    Conv-BN-Chomp-ReLU (``tcn.py:28-60``).

    The reference pads the Conv1d by ``(k-1)·d`` on BOTH sides and chomps
    symmetrically AFTER BatchNorm. For the conv math and eval-mode BN
    (running stats) that composition is exactly a centered SAME conv —
    the eval path convolves once with ``(k-1)·d/2`` per side. But in
    TRAIN mode torch's BN computes batch statistics over the UNCHOMPED
    ``T+(k-1)·d`` positions — the ``(k-1)·d`` boundary columns produced
    from zero-padded windows are part of every mean/var (62% of positions
    at the deepest layer of the shipped multibranch config, k=7 d=8 on
    29-frame clips). The train path reproduces that exactly: pad → VALID
    conv to length ``T+(k-1)·d`` → BN (batch stats over the padded
    length) → symmetric chomp → activation. One shared VALID conv serves
    both paths, so the parameter tree is unchanged. Verified end-to-end
    by ``scripts/parity_check.py --train-parity-video``.
    """

    features: int
    kernel_size: int
    dilation: int
    relu_type: str = "prelu"
    dwpw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        full = (self.kernel_size - 1) * self.dilation
        half = full // 2

        def pad_t(v, p):
            return jnp.pad(v, ((0, 0), (p, p), (0, 0)))

        def chomp(v):
            # symmetric chomp of `full` (tcn.py:12-25); (k-1)·d is even
            # for the odd kernels used everywhere
            return v[:, half : v.shape[1] - (full - half)] if train else v

        def run_conv(conv, bn, act, v):
            # train: torch's pad->conv->BN(padded stats)->chomp; eval:
            # the equivalent centered SAME conv (cheaper, same values)
            v = conv(pad_t(v, full if train else half))
            v = bn(v, use_running_average=not train)
            return act(chomp(v))

        if self.dwpw:
            x = run_conv(
                nn.Conv(x.shape[-1], (self.kernel_size,),
                        kernel_dilation=(self.dilation,), padding="VALID",
                        feature_group_count=x.shape[-1], use_bias=False,
                        name="dw_conv"),
                TorchBatchNorm(momentum=0.9, epsilon=1e-5, name="dw_bn"),
                _act(self.relu_type, "dw_act"), x)
            x = nn.Conv(self.features, (1,), use_bias=False, name="pw_conv")(x)
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="pw_bn")(x)
            return _act(self.relu_type, "pw_act")(x)
        return run_conv(
            nn.Conv(self.features, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    name="conv"),
            TorchBatchNorm(momentum=0.9, epsilon=1e-5, name="bn"),
            _act(self.relu_type, "act"), x)


class MultibranchTemporalBlock(nn.Module):
    features: int
    kernel_sizes: tuple[int, ...]
    dilation: int
    dropout: float = 0.2
    relu_type: str = "prelu"
    dwpw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        num_k = len(self.kernel_sizes)
        if self.features % num_k:
            raise ValueError("features must divide evenly across branches")
        branch_f = self.features // num_k
        n_inputs = x.shape[-1]

        out0 = jnp.concatenate(
            [
                ConvBatchRelu(
                    branch_f, k, self.dilation, self.relu_type, self.dwpw,
                    name=f"cbcr0_{i}",
                )(x, train=train)
                for i, k in enumerate(self.kernel_sizes)
            ],
            axis=-1,
        )
        out0 = nn.Dropout(self.dropout, deterministic=not train)(out0)
        out1 = jnp.concatenate(
            [
                ConvBatchRelu(
                    branch_f, k, self.dilation, self.relu_type, self.dwpw,
                    name=f"cbcr1_{i}",
                )(out0, train=train)
                for i, k in enumerate(self.kernel_sizes)
            ],
            axis=-1,
        )
        out1 = nn.Dropout(self.dropout, deterministic=not train)(out1)
        # reference condition (tcn.py:87): 1x1 downsample unless the *per-
        # branch* input width already equals the output width
        if (n_inputs // num_k) != self.features:
            res = nn.Conv(self.features, (1,), name="downsample")(x)
        else:
            res = x
        return _act(self.relu_type, "relu_final")(out1 + res)


class TemporalBlock(nn.Module):
    features: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2
    relu_type: str = "prelu"
    dwpw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n_inputs = x.shape[-1]
        out = ConvBatchRelu(
            self.features, self.kernel_size, self.dilation, self.relu_type,
            self.dwpw, name="conv1",
        )(x, train=train)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = ConvBatchRelu(
            self.features, self.kernel_size, self.dilation, self.relu_type,
            self.dwpw, name="conv2",
        )(out, train=train)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        res = x if n_inputs == self.features else nn.Conv(self.features, (1,), name="downsample")(x)
        return _act(self.relu_type, "relu")(out + res)


class TemporalConvNet(nn.Module):
    """Single-branch TCN stack; dilation doubles per level (``tcn.py:227-244``)."""

    num_channels: tuple[int, ...]
    kernel_size: int = 3
    dropout: float = 0.2
    relu_type: str = "prelu"
    dwpw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(
                ch, self.kernel_size, 2 ** i, self.dropout, self.relu_type,
                self.dwpw, name=f"block{i}",
            )(x, train=train)
        return x


class MultibranchTemporalConvNet(nn.Module):
    """Multi-branch TCN stack (``tcn.py:118-140``)."""

    num_channels: tuple[int, ...]
    kernel_sizes: tuple[int, ...] = (3, 5, 7)
    dropout: float = 0.2
    relu_type: str = "prelu"
    dwpw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.num_channels):
            x = MultibranchTemporalBlock(
                ch, tuple(self.kernel_sizes), 2 ** i, self.dropout,
                self.relu_type, self.dwpw, name=f"block{i}",
            )(x, train=train)
        return x
