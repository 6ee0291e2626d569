"""Masked temporal reductions for ragged batches on static shapes.

TPU/XLA wants static shapes; the corpus has variable-length utterances and
variable-size video clip groups (e.g. the ragged per-speaker crops at
``models/audio_models/datasets.py:112-136`` and per-trial clip groups at
``train_fusion.py:267-281``). The TPU-native pattern is: pad to a shape
bucket, carry integer lengths, and reduce with masks. Because the embedder's
convolutions are VALID (no padding), outputs whose receptive field lies
entirely in real frames are identical to the unpadded computation — so masked
pooling over the valid region reproduces per-utterance results exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """``(B,) -> (B, max_len)`` mask of 1.0 for t < length."""
    t = jnp.arange(max_len)
    return (t[None, :] < lengths[:, None]).astype(dtype)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Mean over ``axis`` counting only masked-in positions.

    ``mask`` broadcasts against ``x`` (1.0 = keep).
    """
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1.0)


def masked_std(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1, ddof: int = 1, eps: float = 0.0
) -> jnp.ndarray:
    """Standard deviation over masked positions.

    Default ``ddof=1`` (unbiased) matches ``torch.std`` as used by the
    reference's statistics pooling (``models/audio_models/pooling.py:25``).
    """
    count = jnp.sum(mask, axis=axis)
    mean = jnp.sum(x * mask, axis=axis) / jnp.maximum(count, 1.0)
    sq = jnp.sum((x - jnp.expand_dims(mean, axis)) ** 2 * mask, axis=axis)
    var = sq / jnp.maximum(count - ddof, 1.0)
    return jnp.sqrt(var + eps)


def masked_mean_std(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1, ddof: int = 1
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused masked mean and (unbiased) std along ``axis``."""
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    mean = jnp.sum(x * mask, axis=axis) / count
    sq = jnp.sum((x - jnp.expand_dims(mean, axis)) ** 2 * mask, axis=axis)
    std = jnp.sqrt(sq / jnp.maximum(count - ddof, 1.0))
    return mean, std
