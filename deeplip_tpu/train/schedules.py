"""Learning-rate schedules matching the reference recipes.

- :func:`multistep_schedule` ≙ torch ``MultiStepLR`` stepped per *epoch*
  (``train_audio.py:130``, milestones ``[15, 25]`` × γ=0.1 from
  ``conf/audio_config.yaml:126-127``), expressed as a per-step optax
  schedule via ``steps_per_epoch``.
- :func:`cosine_annealing_schedule` ≙ torch ``CosineAnnealingLR(T_max)``;
  the video trainer steps it per *iteration* (``train_video.py:110-111,143``),
  so ``t`` here is the optimizer step count. The closed form
  ``eta_min + (base - eta_min)(1 + cos(π t / T_max)) / 2`` reproduces
  torch's trajectory on [0, T_max] and continues periodically beyond.
"""

from __future__ import annotations

import jax.numpy as jnp


def multistep_schedule(init_lr: float, milestones_epochs, gamma: float, steps_per_epoch: int):
    boundaries = [int(m) * int(steps_per_epoch) for m in milestones_epochs]

    def schedule(step):
        step = jnp.asarray(step)
        n_passed = sum((step >= b).astype(jnp.int32) for b in boundaries)
        return init_lr * (gamma ** n_passed)

    return schedule


def cosine_annealing_schedule(init_lr: float, t_max: int, eta_min: float = 0.0):
    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        return eta_min + (init_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t / t_max)) / 2.0

    return schedule
