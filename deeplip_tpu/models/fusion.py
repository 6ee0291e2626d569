"""Audio-visual fusion heads (Flax).

Rebuilds ``models/fusion_models/`` TPU-first:

- :class:`LowFER` — the live code path of ``LBP.py:28-54``: a low-rank
  bilinear (MFB) branch ``(e1 U) ⊙ (e2 V)`` pooled over ``k`` and
  L2-normalized, then the gated-concat output the reference actually
  returns: ``[e1, σ(e2), σ(e2) ⊙ e1]`` (the MFB vector is computed but then
  overwritten at ``LBP.py:48-50``; we keep both taps and return the gated
  concat from ``__call__`` for parity, with the MFB branch available via
  ``mfb``). Output dim = ``3 * d1``.
- :class:`LinearFusion` — FC → BN → LeakyReLU(0.2) → FC with an
  ``extract_feats`` switch returning the hidden layer
  (``model_fusion.py:10-28``).
- :class:`CompactBilinearPooling` — FFT count-sketch bilinear pooling; the
  reference ships only compiled bytecode for this (see SURVEY.md), so this
  is a fresh implementation of the published algorithm (Gao et al. 2016):
  random hash/sign sketches, rFFT product, inverse rFFT. FFTs are
  XLA-native on TPU. The sketch indices/signs are deterministic
  non-trainable variables drawn at init.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from deeplip_tpu.models.norm import TorchBatchNorm


class LowFER(nn.Module):
    """Low-rank bilinear pooling + σ-gated concat fusion head.

    ``input_dims`` are (d1, d2) of the audio/video embeddings; the U/V
    factors are uniform(-1, 1) initialized like the reference (``LBP.py:12-15``,
    minus the cuda pinning).
    """

    input_dims: tuple[int, int] = (512, 512)
    k: int = 30
    output_dim: int = 512  # `o` in the reference; MFB branch width

    def setup(self):
        uniform = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
        self.U = self.param("U", uniform, (self.input_dims[0], self.k * self.output_dim))
        self.V = self.param("V", uniform, (self.input_dims[1], self.k * self.output_dim))
        if self.input_dims[0] != self.input_dims[1]:
            self.gate_proj = nn.Dense(self.input_dims[0], name="gate_proj")

    def mfb(self, e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
        """Low-rank bilinear branch: ``(B, o)`` L2-normalized (``LBP.py:38-43``)."""
        x = jnp.matmul(e1, self.U, precision="highest") * jnp.matmul(
            e2, self.V, precision="highest"
        )
        # (B, k*o) -> (B, o, k): row-major split matching torch .view(-1, o, k)
        x = x.reshape(-1, self.output_dim, self.k).mean(-1)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)

    def __call__(self, e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
        # The reference computes the MFB vector and then overwrites it with
        # the gated concat (LBP.py:48-50); the live output is the latter.
        # The reference's gate assumes d1 == d2 (both 512); for unequal dims
        # a linear projection maps the gate input onto d1 (extension).
        if self.input_dims[0] != self.input_dims[1]:
            e2 = self.gate_proj(e2)
        gate = jax.nn.sigmoid(e2)
        return jnp.concatenate([e1, gate, gate * e1], axis=-1)


class LinearFusion(nn.Module):
    """FC(d1+d2 → hidden) + BN + LeakyReLU + FC; ``extract_feats`` taps hidden."""

    hidden_size: int = 512
    extract_feats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, name="fc1")(x)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        out = nn.Dense(self.hidden_size, name="fc2")(h)
        return h if self.extract_feats else out


class CompactBilinearPooling(nn.Module):
    """Count-sketch FFT bilinear pooling: ``(B, d1), (B, d2) -> (B, d_out)``."""

    output_dim: int = 512

    @nn.compact
    def __call__(self, e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
        d1, d2 = e1.shape[-1], e2.shape[-1]

        def make_sketch(key, d):
            kh, ks = jax.random.split(key)
            h = jax.random.randint(kh, (d,), 0, self.output_dim)
            s = jax.random.rademacher(ks, (d,), dtype=jnp.float32)
            return h, s

        h1, s1 = self.variable(
            "sketch", "hs1", make_sketch, jax.random.PRNGKey(1), d1
        ).value
        h2, s2 = self.variable(
            "sketch", "hs2", make_sketch, jax.random.PRNGKey(2), d2
        ).value

        def sketch(x, h, s):
            vals = x * s
            out = jnp.zeros(x.shape[:-1] + (self.output_dim,), x.dtype)
            return out.at[..., h].add(vals)

        f1 = jnp.fft.rfft(sketch(e1, h1, s1), axis=-1)
        f2 = jnp.fft.rfft(sketch(e2, h2, s2), axis=-1)
        return jnp.fft.irfft(f1 * f2, n=self.output_dim, axis=-1)
