"""Online triplet losses with in-graph mining (static shapes, no host loop).

The reference mines triplets on the host with Python loops over the batch
(``models/audio_models/utils.py:31-142``: ``AllTripletSelector`` and
``FunctionNegativeTripletSelector`` with hardest/random/semihard policies)
and scores them with cosine similarity (``loss.py:18-31``). Host-side
data-dependent selection forces dynamic shapes and device round-trips, so
here mining is reformulated as masked reductions over the full ``B×B``
cosine matrix — one MXU matmul plus elementwise masking, jit/vmap/grad-safe:

- ``batch_all``   ≙ AllTripletSelector: every valid (a, p, n), mean loss;
- ``batch_hard``  ≙ HardestNegativeTripletSelector: per (a, p) pair, the
  negative maximizing the loss, counted only when its loss > 0;
- ``semihard``    ≙ SemihardNegativeTripletSelector: negatives with
  0 < loss < margin.

Losses are ``relu(cos(a, n) - cos(a, p) + margin)`` — note the reference
(and hence this module) treats *higher* cosine as *more similar*, so the
margin pushes negative similarity below positive similarity.
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp


def _cosine_matrix(embeddings: jnp.ndarray) -> jnp.ndarray:
    e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True).clip(1e-12)
    return jnp.matmul(e, e.T, precision="highest")


def _pair_masks(labels: jnp.ndarray):
    b = labels.shape[0]
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(b, dtype=bool)
    pos = same & ~eye  # valid anchor-positive pairs
    neg = ~same  # valid anchor-negative pairs
    return pos, neg


def batch_all_triplet_loss(
    embeddings: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.2
):
    """Mean hinge over all valid triplets. Returns ``(loss, n_triplets)``."""
    cos = _cosine_matrix(embeddings)
    pos, neg = _pair_masks(labels)
    # loss[a, p, n] = relu(cos[a, n] - cos[a, p] + margin)
    tri = jnp.maximum(cos[:, None, :] - cos[:, :, None] + margin, 0.0)
    valid = pos[:, :, None] & neg[:, None, :]
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(tri * valid) / count, count


def batch_hard_triplet_loss(
    embeddings: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.2
):
    """Hardest-negative-per-(anchor, positive) hinge, averaged over pairs
    whose hardest loss is positive (FunctionNegativeTripletSelector with
    ``hardest_negative`` semantics)."""
    cos = _cosine_matrix(embeddings)
    pos, neg = _pair_masks(labels)
    neg_scores = jnp.where(neg, cos, -jnp.inf)  # (a, n)
    hardest_neg = jnp.max(neg_scores, axis=-1)  # per anchor
    losses = jnp.maximum(hardest_neg[:, None] - cos + margin, 0.0)  # (a, p)
    active = pos & (losses > 0)
    count = jnp.maximum(jnp.sum(active), 1)
    return jnp.sum(losses * active) / count, count


def semihard_triplet_loss(
    embeddings: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.2
):
    """Mean hinge over semihard triplets (0 < loss < margin)."""
    cos = _cosine_matrix(embeddings)
    pos, neg = _pair_masks(labels)
    tri = cos[:, None, :] - cos[:, :, None] + margin
    valid = pos[:, :, None] & neg[:, None, :] & (tri > 0) & (tri < margin)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.maximum(tri, 0.0) * valid) / count, count


def contrastive_loss(
    embeddings: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.5
):
    """Pairwise contrastive loss over all batch pairs (the reference's
    ``Contrastive`` is an empty stub, ``loss.py:69-75``; implemented here).

    Positives pull cosine toward 1, negatives push it below ``margin``.
    """
    cos = _cosine_matrix(embeddings)
    pos, neg = _pair_masks(labels)
    pos_loss = jnp.sum((1.0 - cos) * pos)
    neg_loss = jnp.sum(jnp.maximum(cos - margin, 0.0) * neg)
    count = jnp.maximum(jnp.sum(pos) + jnp.sum(neg), 1)
    return (pos_loss + neg_loss) / count, count


class OnlineTripletLoss:
    """Callable facade mirroring the reference's ``OnlineTriplet`` module
    (``loss.py:18-31``): ``loss, n = criterion(embeddings, labels)``."""

    def __init__(
        self,
        margin: float = 0.2,
        strategy: Literal["all", "hardest", "semihard"] = "hardest",
    ):
        self.margin = margin
        self.strategy = strategy

    def __call__(self, embeddings: jnp.ndarray, labels: jnp.ndarray):
        fn = {
            "all": batch_all_triplet_loss,
            "hardest": batch_hard_triplet_loss,
            "semihard": semihard_triplet_loss,
        }[self.strategy]
        return fn(embeddings, labels, self.margin)
