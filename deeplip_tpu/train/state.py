"""Train state container and optimizer construction.

Optimizers replicate torch semantics used by the reference
(``train_audio.py:118-123``): SGD with momentum + coupled L2 weight decay
(decay added to the gradient *before* the momentum trace, torch-style), and
Adam with coupled L2 decay. Parameter freezing (the reference's finetune
mode flips ``requires_grad`` and rebuilds the optimizer,
``train_audio.py:276-296``) is expressed functionally: a trainable-mask
pytree zeroes updates for frozen subtrees, so the same compiled step serves
full training and head-only finetuning.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int


def torch_sgd(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0):
    """SGD(momentum) with torch's coupled decay and update convention.

    torch applies ``g += wd * p``, then ``buf = μ buf + g`` and
    ``p -= lr * buf`` — i.e. the momentum trace is *not* premultiplied by
    lr, which matters when the lr schedule steps down.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(learning_rate),
    )


def torch_adam(learning_rate, weight_decay: float = 0.0, b1=0.9, b2=0.999, eps=1e-8):
    """Adam with torch's coupled L2 decay (decay folded into the gradient)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def build_optimizer(
    opt_type: str,
    learning_rate: float | Callable,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    trainable_mask: Any | None = None,
) -> optax.GradientTransformation:
    """Optimizer factory mirroring the ``train.type`` config switch
    (``conf/audio_config.yaml:124,133-139``). ``trainable_mask`` is a pytree
    of bools (prefix tree allowed): False subtrees receive zero updates."""
    if opt_type == "sgd":
        tx = torch_sgd(learning_rate, momentum, weight_decay)
    elif opt_type == "adam":
        tx = torch_adam(learning_rate, weight_decay)
    else:
        raise NotImplementedError(f"optimizer {opt_type!r}")
    if trainable_mask is not None:
        # masked(tx) transforms only trainable leaves (frozen leaves pass
        # through as raw grads) — then zero the frozen leaves' updates.
        tx = optax.chain(optax.masked(tx, trainable_mask), _zero_frozen(trainable_mask))
    return tx


def _zero_frozen(mask_tree) -> optax.GradientTransformation:
    """Zero updates where the mask is False."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        mask = _expand_mask(mask_tree, updates)
        zeroed = jax.tree_util.tree_map(
            lambda u, m: u if m else jax.numpy.zeros_like(u), updates, mask
        )
        return zeroed, state

    return optax.GradientTransformation(init_fn, update_fn)


def _expand_mask(mask, tree):
    """Broadcast a bool prefix-tree over the full param tree."""

    def rec(m, t):
        if isinstance(m, bool):
            return jax.tree_util.tree_map(lambda _: m, t)
        if isinstance(m, Mapping):
            return {k: rec(m[k], t[k]) for k in t}
        raise TypeError(f"bad mask node {type(m)}")

    return rec(mask, tree)
