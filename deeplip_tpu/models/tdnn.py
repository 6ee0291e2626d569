"""TDNN / E-TDNN x-vector speaker embedding network (Flax).

Re-designs ``models/audio_models/tdnn.py`` TPU-first:

- activations are time-major ``(B, T, C)`` so each TDNN layer is one
  ``nn.Conv`` (NWC) that XLA lowers straight onto the MXU — no NCW
  transposes;
- the context spec is interpreted exactly like the reference
  (``tdnn.py:18-22``): ``kernel_size = len(context)`` and
  ``dilation = (context[-1] - context[0]) // (len(context) - 1)`` for
  multi-tap contexts, with VALID padding;
- batches may be padded to shape buckets: because convs are VALID, passing
  ``lengths`` makes pooling reduce only over outputs whose receptive field
  is fully real, which reproduces unpadded per-utterance results exactly;
- BatchNorm uses torch semantics (momentum 0.9 running-stat decay, eps
  1e-5). Under a sharded-batch jit the batch statistics are computed over
  the *global* batch (sync-BN); the reference's DataParallel computed
  per-replica stats, which is a strictly noisier estimate.

Scope of the padded-batch exactness guarantee: EVAL (running-stat BN +
VALID convs + masked pooling) reproduces per-utterance results exactly for
any bucket padding. TRAIN-mode BN computes batch statistics over all time
positions — exact-length crops (the training recipe, reference
``datasets.py:112-136``) never pad, but training on padded buckets would
let pad-influenced frames into the statistics.

Embedding taps (parity with ``tdnn.py:89-111``):
``extract_embedding`` returns ``(xv, x_a)`` where ``xv`` is the second FC
output (the LMCL embedding) and ``x_a`` the first FC pre-activation (the
CrossEntropy embedding); ``__call__`` additionally applies bn2+activation
and is what feeds the training criterion.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax.numpy as jnp

from deeplip_tpu.models.norm import TorchBatchNorm
from deeplip_tpu.models.pooling import (
    AttentiveStatPooling,
    AveragePooling,
    MeanStdPooling,
    MonoHeadAttention,
    MultiHeadAttentivePooling,
)


def context_to_kernel(context: Sequence[int]) -> tuple[int, int]:
    """``context -> (kernel_size, dilation)`` per ``tdnn.py:18-22``."""
    kernel_size = len(context)
    if kernel_size > 1:
        dilation = (context[-1] - context[0]) // (kernel_size - 1)
    else:
        dilation = 1
    return kernel_size, dilation


class TDNNBlock(nn.Module):
    """Dilated Conv1d -> BN -> LeakyReLU(0.2) (order per ``bn_first``).

    ``dtype`` is the compute dtype (params stay float32): bf16 halves the
    activation HBM traffic for training; eval paths keep float32.
    ``precision`` sets the conv's MXU precision — 'default'/'high'/
    'highest', 'wsplit2' (2-pass weight-compensated,
    ``ops.precision.WeightSplitConv``), or None to inherit the ambient
    ``jax.default_matmul_precision``. Parameter layout is identical for
    every mode.
    """

    features: int
    context: tuple[int, ...]
    bn_first: bool = True
    dtype: jnp.dtype = jnp.float32
    precision: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kernel_size, dilation = context_to_kernel(self.context)
        if self.precision in ("wsplit2", "asplit2"):
            from deeplip_tpu.ops.precision import SplitConv

            x = SplitConv(self.features, kernel_size, dilation,
                          mode=self.precision, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(kernel_size,),
                kernel_dilation=(dilation,),
                padding="VALID",
                dtype=self.dtype,
                precision=self.precision,
                name="conv",
            )(x)
        bn = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn"
        )
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        if self.bn_first:
            return act(bn(x))
        return bn(act(x))


def _pooling_from_name(name: str, attention_hidden_size: int) -> nn.Module:
    if name == "statistic":
        return MeanStdPooling()
    if name == "average":
        return AveragePooling()
    if name == "attentive_statistic":
        return AttentiveStatPooling(hidden_size=attention_hidden_size)
    if name == "mono_head_attention":
        return MonoHeadAttention(hidden_size=attention_hidden_size)
    if name == "multi_head_attention":
        return MultiHeadAttentivePooling(hidden_size=attention_hidden_size)
    raise NotImplementedError(f"pooling {name!r} not implemented")


class SpeakerEmbNet(nn.Module):
    """Config-driven TDNN/E-TDNN x-vector network.

    ``arch_opts`` is the per-arch dict of the reference config
    (``conf/audio_config.yaml:64-83``): ``context``, ``hidden_dim``,
    ``tdnn_layers``, ``embedding_dim``, ``pooling``,
    ``attention_hidden_size``, ``bn_first``.
    """

    contexts: tuple[tuple[int, ...], ...]
    hidden_dims: tuple[int, ...]
    embedding_dim: int = 512
    pooling: str = "statistic"
    attention_hidden_size: int = 64
    bn_first: bool = True
    dtype: jnp.dtype = jnp.float32
    # MXU precision plan: one mode for every conv, or a per-layer tuple
    # (len == n blocks); fc_precision covers the two Dense heads. None
    # inherits the ambient jax.default_matmul_precision. Measured per-op
    # error budgets: benchmarks/precision_budget.py.
    conv_precision: str | tuple[str | None, ...] | None = None
    fc_precision: str | None = None

    @classmethod
    def from_config(cls, model_opts: Mapping[str, Any]) -> "SpeakerEmbNet":
        """Build from the nested model config (``{'arch': ..., '<arch>': {...}}``)."""
        arch = model_opts["arch"]
        opts = model_opts[arch]
        n = int(opts.get("tdnn_layers", len(opts["context"])))
        return cls(
            contexts=tuple(tuple(c) for c in opts["context"][:n]),
            hidden_dims=tuple(opts["hidden_dim"][:n]),
            embedding_dim=int(opts["embedding_dim"]),
            pooling=opts.get("pooling", "statistic"),
            attention_hidden_size=int(opts.get("attention_hidden_size", 64)),
            bn_first=bool(opts.get("bn_first", True)),
        )

    @property
    def receptive_field(self) -> int:
        """Frames consumed by the VALID conv stack: ``T_out = T - rf + 1``."""
        rf = 1
        for ctx in self.contexts:
            k, d = context_to_kernel(ctx)
            rf += (k - 1) * d
        return rf

    def valid_lengths(self, lengths: jnp.ndarray) -> jnp.ndarray:
        return jnp.maximum(lengths - (self.receptive_field - 1), 1)

    def setup(self):
        cp = self.conv_precision
        if cp is None or isinstance(cp, str):
            cp = (cp,) * len(self.contexts)
        if len(cp) != len(self.contexts):
            raise ValueError(
                f"conv_precision has {len(cp)} entries for "
                f"{len(self.contexts)} blocks")
        self.blocks = [
            TDNNBlock(f, ctx, self.bn_first, dtype=self.dtype,
                      precision=cp[i], name=f"tdnn_{i}")
            for i, (f, ctx) in enumerate(zip(self.hidden_dims, self.contexts))
        ]
        self.pool = _pooling_from_name(self.pooling, self.attention_hidden_size)
        self.fc1 = nn.Dense(self.embedding_dim, precision=self.fc_precision)
        self.bn1 = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
        self.fc2 = nn.Dense(self.embedding_dim, precision=self.fc_precision)
        self.bn2 = TorchBatchNorm(momentum=0.9, epsilon=1e-5)

    def _act(self, x):
        return nn.leaky_relu(x, negative_slope=0.2)

    def extract_embedding(
        self, x: jnp.ndarray, train: bool = False, lengths=None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """``(B, T, D) -> (xv, x_a)``: LMCL / CrossEntropy embedding taps."""
        x = x.astype(self.dtype)
        for blk in self.blocks:
            x = blk(x, train=train)
        # statistics pooling and the FC head stay >= float32 (std of bf16
        # activations loses too much precision; f64 runs stay f64)
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        pooled_lengths = None if lengths is None else self.valid_lengths(lengths)
        x = self.pool(x, lengths=pooled_lengths)
        x_a = self.fc1(x)
        if self.bn_first:
            x = self._act(self.bn1(x_a, use_running_average=not train))
        else:
            x = self.bn1(self._act(x_a), use_running_average=not train)
        xv = self.fc2(x)
        return xv, x_a

    def __call__(self, x: jnp.ndarray, train: bool = False, lengths=None) -> jnp.ndarray:
        xv, _ = self.extract_embedding(x, train=train, lengths=lengths)
        if self.bn_first:
            return self._act(self.bn2(xv, use_running_average=not train))
        return self.bn2(self._act(xv), use_running_average=not train)
