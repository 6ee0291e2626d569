"""Classification criteria for speaker embedding training (Flax).

Parity targets (``models/audio_models/loss.py``):

- :class:`CrossEntropyHead` — linear head + softmax CE (``loss.py:6-16``).
  The reference adds ``1e-8`` to the logits before CE; that is a constant
  shift, mathematically a no-op under softmax, so it is omitted here.
- :class:`LMCL` (AM-Softmax, ``loss.py:33-51``) — cosine logits between
  L2-normalized embeddings and class weights, additive margin ``m`` on the
  target class, scale ``s``, plus the reference's ``1e-5 * ||W||_1``
  regularizer. The margin is a *call argument* (not a hyperparameter baked
  into the compiled graph) so the reference's margin schedule
  (``train_audio.py:141-145``) never triggers a recompile.
- :class:`AAMSoftmax` / :class:`ASoftmax` — declared-but-empty stubs in the
  reference (``loss.py:54-67``); implemented properly here (ArcFace additive
  angular margin; SphereFace multiplicative angular margin with the standard
  monotonic ψ decomposition).

Every criterion returns ``(loss, logits)`` like the reference, where
``logits`` are the *pre-margin* scores used for training accuracy.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _one_hot(labels: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    return jax.nn.one_hot(labels, n, dtype=dtype)


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, reduction: str = "mean"
) -> jnp.ndarray:
    """Softmax cross-entropy (torch ``F.cross_entropy``); ``reduction='none'``
    returns the per-example vector (for masked reductions)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    per_example = logz - true_logit
    return per_example if reduction == "none" else jnp.mean(per_example)


class CrossEntropyHead(nn.Module):
    """Linear classifier head returning ``(loss, logits)``."""

    num_classes: int

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, labels: jnp.ndarray,
                 reduction: str = "mean"):
        logits = nn.Dense(self.num_classes, name="fc")(embeddings)
        return softmax_cross_entropy(logits, labels, reduction), logits


class LMCL(nn.Module):
    """Large-margin cosine loss (AM-Softmax) head.

    ``margin`` defaults to ``self.init_margin`` but can be overridden per
    call for margin scheduling.
    """

    num_classes: int
    scale: float = 30.0
    init_margin: float = 0.2
    l1_weight: float = 1e-5

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, labels: jnp.ndarray, margin=None,
                 reduction: str = "mean"):
        d = embeddings.shape[-1]
        # kaiming-normal over (num_classes, d), matching the torch init scale
        w = self.param(
            "weights",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (self.num_classes, d),
        )
        margin = self.init_margin if margin is None else margin
        e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True).clip(1e-12)
        wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True).clip(1e-12)
        logits = jnp.matmul(e, wn.T, precision="highest")
        margins = _one_hot(labels, self.num_classes, logits.dtype) * margin
        loss = softmax_cross_entropy(self.scale * (logits - margins), labels, reduction)
        loss = loss + self.l1_weight * jnp.sum(jnp.abs(w))
        return loss, logits


class AAMSoftmax(nn.Module):
    """ArcFace: additive *angular* margin ``cos(θ + m)`` on the target class.

    Uses the standard easy-margin-free formulation: where ``cos θ`` is past
    the valid range for the margin identity, fall back to the linear
    surrogate ``cos θ - m·sin(m)``.
    """

    num_classes: int
    scale: float = 30.0
    init_margin: float = 0.2

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, labels: jnp.ndarray, margin=None,
                 reduction: str = "mean"):
        d = embeddings.shape[-1]
        w = self.param(
            "weights",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (self.num_classes, d),
        )
        margin = self.init_margin if margin is None else margin
        e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True).clip(1e-12)
        wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True).clip(1e-12)
        # clip strictly inside [-1, 1]: at exactly +-1 both sqrt(1-cos^2)
        # and arccos have infinite derivatives -> NaN gradients the first
        # time an embedding aligns with its class weight
        cos = jnp.matmul(e, wn.T, precision="highest").clip(-1.0 + 1e-7, 1.0 - 1e-7)
        sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 0.0))
        cos_m = jnp.cos(margin)
        sin_m = jnp.sin(margin)
        phi = cos * cos_m - sin * sin_m  # cos(θ + m)
        phi = jnp.where(cos > jnp.cos(jnp.pi - margin), phi, cos - margin * sin_m)
        onehot = _one_hot(labels, self.num_classes, cos.dtype)
        logits_m = jnp.where(onehot > 0, phi, cos)
        loss = softmax_cross_entropy(self.scale * logits_m, labels, reduction)
        return loss, cos


class ASoftmax(nn.Module):
    """SphereFace A-Softmax: multiplicative angular margin ``cos(mθ)``.

    Implements the ψ(θ) = (-1)^k cos(mθ) - 2k monotonic decomposition with
    the standard λ-annealed blend ``(λ cosθ + ψ(θ)) / (1 + λ)``; ``lam`` can
    be passed per call for annealing.
    """

    num_classes: int
    m: int = 4
    base_lambda: float = 5.0

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, labels: jnp.ndarray, lam=None,
                 reduction: str = "mean"):
        d = embeddings.shape[-1]
        w = self.param(
            "weights",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (self.num_classes, d),
        )
        lam = self.base_lambda if lam is None else lam
        norms = jnp.linalg.norm(embeddings, axis=-1, keepdims=True).clip(1e-12)
        e = embeddings / norms
        wn = w / jnp.linalg.norm(w, axis=-1, keepdims=True).clip(1e-12)
        cos = jnp.matmul(e, wn.T, precision="highest").clip(-1.0 + 1e-7, 1.0 - 1e-7)
        theta = jnp.arccos(cos)
        k = jnp.floor(self.m * theta / jnp.pi)
        # (-1)^k with a traced float exponent lowers to pow(-1, k) which
        # NaNs on TPU (expanded as exp(k*log(-1))); parity-select instead
        sign = 1.0 - 2.0 * jnp.mod(k, 2.0)
        psi = sign * jnp.cos(self.m * theta) - 2.0 * k
        blended = (lam * cos + psi) / (1.0 + lam)
        onehot = _one_hot(labels, self.num_classes, cos.dtype)
        logits_m = jnp.where(onehot > 0, blended, cos) * norms
        loss = softmax_cross_entropy(logits_m, labels, reduction)
        return loss, cos * norms


def build_criterion(name: str, num_classes: int, scale: float = 30.0, margin: float = 0.2):
    """Criterion factory mirroring the reference's loss selection strings
    (``train_audio.py:102-113``, ``conf/audio_config.yaml:130``)."""
    if name == "CrossEntropy":
        return CrossEntropyHead(num_classes=num_classes)
    if name == "LMCL":
        return LMCL(num_classes=num_classes, scale=scale, init_margin=margin)
    if name == "AAM-Softmax":
        return AAMSoftmax(num_classes=num_classes, scale=scale, init_margin=margin)
    if name == "A-Softmax":
        return ASoftmax(num_classes=num_classes)
    raise NotImplementedError(f"loss {name!r} not implemented")
