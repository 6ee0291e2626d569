"""Temporal pooling zoo for speaker embedding networks.

Re-designs the reference pooling layers (``models/audio_models/pooling.py``)
for TPU: activations are time-major ``(B, T, C)`` (XLA's native conv layout,
so no transposes around convs), every pooling accepts an optional ``lengths``
vector so padded shape-bucketed batches reduce exactly like unpadded ones,
and the attention scores are plain MXU matmuls.

Semantics parity notes
----------------------
- ``MeanStdPooling``: mean + *unbiased* std over time, concatenated — the
  reference uses ``torch.std`` (ddof=1) at ``pooling.py:24-26``.
- ``AttentiveStatPooling`` (``pooling.py:73-107``): scores
  ``relu(x W^T + b) v + k`` softmaxed over time; attention-weighted mean and
  std ``sqrt(E[x^2] - E[x]^2)``.
- ``MonoHeadAttention`` (``pooling.py:28-60``): the reference computes the
  ReLU of the hidden map but then scores the *pre-activation* hidden map
  (``e = v·hidden + k`` at ``pooling.py:51-53``); we reproduce that exactly.
- ``MultiHeadAttentivePooling``: the reference's ``MultiHeadAttention`` is an
  empty stub (``pooling.py:63-71``); implemented here properly as a
  multi-head attentive statistics pooling.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from deeplip_tpu.ops.masked import length_mask


def _time_mask(x: jnp.ndarray, lengths) -> jnp.ndarray | None:
    """(B, T, 1) float mask or None when the batch is unpadded."""
    if lengths is None:
        return None
    return length_mask(lengths, x.shape[1], dtype=x.dtype)[..., None]


class MeanStdPooling(nn.Module):
    """Statistics pooling: ``(B, T, C) -> (B, 2C)`` mean ++ unbiased std.

    Single-pass statistics (r4): ``Σx`` and ``Σx²`` reduce over ONE read of
    the ``(B, T, C)`` activation (XLA fuses both reductions into one loop);
    the two-pass ``Σ(x−mean)²`` form forces a second full HBM read of the
    biggest tensor in the extraction path — the same bandwidth tax the r3
    single-pass BN removed (``models/norm.py``). ``var = (Σx² − n·mean²)/
    (n−1)`` cancels at ~eps·(1 + mean²/var) relative — harmless for
    BN-regulated activations (torch-parity suites hold unchanged, incl.
    the f64 train-step harness); the ``max(·, 0)`` guards pathological
    cancellation from producing NaN through the sqrt. torch parity target:
    unbiased ``torch.std`` (ddof=1), reference ``pooling.py:24-26``.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        mask = _time_mask(x, lengths)
        if mask is None:
            n = x.shape[1]
            mean = jnp.mean(x, axis=1)
            s2 = jnp.sum(x * x, axis=1)
            var = jnp.maximum(s2 - n * mean * mean, 0.0) / max(n - 1, 1)
        else:
            count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
            mean = jnp.sum(x * mask, axis=1) / count
            s2 = jnp.sum((x * x) * mask, axis=1)
            var = jnp.maximum(s2 - count * mean * mean, 0.0) / jnp.maximum(
                count - 1.0, 1.0
            )
        # +1e-12 inside the sqrt: bit-invisible for normal variances (needs
        # ~1.2e-7 relative to move an f32) but keeps d(sqrt)/d(var) finite
        # when a clamped single-frame utterance yields var == 0, which would
        # otherwise inject NaN gradients into the whole batch
        return jnp.concatenate([mean, jnp.sqrt(var + 1e-12)], axis=-1)


class AveragePooling(nn.Module):
    """Plain temporal mean: ``(B, T, C) -> (B, C)`` (AdaptiveAvgPool1d(1))."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        mask = _time_mask(x, lengths)
        if mask is None:
            return jnp.mean(x, axis=1)
        return jnp.sum(x * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1.0)


def _masked_softmax(scores: jnp.ndarray, mask, axis: int) -> jnp.ndarray:
    if mask is not None:
        scores = jnp.where(mask > 0, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp(scores)
    if mask is not None:
        e = e * (mask > 0)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-30)


class AttentiveStatPooling(nn.Module):
    """Attentive statistics pooling: ``(B, T, C) -> (B, 2C)``."""

    hidden_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        c = x.shape[-1]
        w = self.param("W", nn.initializers.xavier_normal(), (self.hidden_size, c))
        b = self.param("b", nn.initializers.xavier_normal(), (1, self.hidden_size))
        v = self.param("v", nn.initializers.xavier_normal(), (self.hidden_size, 1))
        k = self.param("k", nn.initializers.xavier_normal(), (1, 1))
        mask = _time_mask(x, lengths)
        hidden = jnp.einsum("btc,hc->bth", x, w) + b
        scores = nn.relu(hidden) @ v + k  # (B, T, 1)
        alpha = _masked_softmax(scores, mask, axis=1)
        mean = jnp.sum(alpha * x, axis=1)
        sq = jnp.sum(alpha * x * x, axis=1)
        std = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))
        return jnp.concatenate([mean, std], axis=-1)


class MonoHeadAttention(nn.Module):
    """Single-head attention mean pooling: ``(B, T, C) -> (B, C)``.

    Faithful to the reference quirk: the score uses the *pre-ReLU* hidden
    projection (``models/audio_models/pooling.py:51-53``).
    """

    hidden_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        c = x.shape[-1]
        w = self.param("W", nn.initializers.xavier_normal(), (self.hidden_size, c))
        b = self.param("b", nn.initializers.xavier_normal(), (self.hidden_size, 1))
        v = self.param("v", nn.initializers.xavier_normal(), (1, self.hidden_size))
        k = self.param("k", nn.initializers.xavier_normal(), (1, 1))
        mask = _time_mask(x, lengths)
        hidden = jnp.einsum("hc,btc->bht", w, x) + b  # (B, H, T)
        scores = jnp.einsum("oh,bht->bot", v, hidden) + k  # (B, 1, T)
        scores = jnp.swapaxes(scores, 1, 2)  # (B, T, 1)
        alpha = _masked_softmax(scores, mask, axis=1)
        return jnp.sum(alpha * x, axis=1)


class MultiHeadAttentivePooling(nn.Module):
    """Multi-head attentive statistics pooling: ``(B, T, C) -> (B, 2C)``.

    The reference declares this (``pooling.py:63-71``) but never implements
    it; here each of ``num_heads`` heads attends over its own channel slice
    and per-head statistics are concatenated.
    """

    num_heads: int = 4
    hidden_size: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        b_, t, c = x.shape
        if c % self.num_heads:
            raise ValueError(f"channels {c} not divisible by heads {self.num_heads}")
        d = c // self.num_heads
        xh = x.reshape(b_, t, self.num_heads, d)
        w = self.param(
            "W", nn.initializers.xavier_normal(), (self.num_heads, self.hidden_size, d)
        )
        bb = self.param("b", nn.initializers.zeros, (self.num_heads, self.hidden_size))
        v = self.param("v", nn.initializers.xavier_normal(), (self.num_heads, self.hidden_size))
        mask = _time_mask(x, lengths)  # (B, T, 1); broadcasts over the head axis
        hidden = nn.relu(jnp.einsum("btnd,nhd->btnh", xh, w) + bb[None, None])
        scores = jnp.einsum("btnh,nh->btn", hidden, v)
        alpha = _masked_softmax(scores, mask, axis=1)
        alpha = alpha[..., None]  # (B, T, N, 1)
        mean = jnp.sum(alpha * xh, axis=1)  # (B, N, D)
        sq = jnp.sum(alpha * xh * xh, axis=1)
        std = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))
        return jnp.concatenate([mean.reshape(b_, c), std.reshape(b_, c)], axis=-1)
