"""Signal framing primitives (batched, static-shape, device-resident).

Replicates the framing semantics the reference inherits from
``python_speech_features.sigproc`` (used via ``mfcc``/``fbank``/``logfbank``
at ``models/audio_models/datasets.py:65-71``):

- ``frame_len = floor(win_len * rate + 0.5)`` (round-half-up),
- ``num_frames = 1 + ceil((slen - frame_len) / frame_step)`` for
  ``slen > frame_len`` else 1, with zero padding up to
  ``(num_frames - 1) * step + frame_len``,
- pre-emphasis ``y[t] = x[t] - 0.97 x[t-1]`` with ``y[0] = x[0]``.

Unlike the reference (per-utterance numpy in 32 DataLoader worker processes),
these run batched on the TPU: framing is one gather producing
``(B, T, frame_len)``, which XLA fuses into the downstream window/DFT matmul.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def round_half_up(x: float) -> int:
    """Banker's-rounding-free round used by python_speech_features."""
    return int(math.floor(x + 0.5))


def frame_len_step(win_len: float, win_shift: float, rate: int) -> tuple[int, int]:
    """Window length / hop in samples from seconds (round-half-up)."""
    return round_half_up(win_len * rate), round_half_up(win_shift * rate)


def num_frames(n_samples: int, frame_len: int, frame_step: int) -> int:
    """Number of frames with the reference's round-up-and-pad convention."""
    if n_samples <= frame_len:
        return 1
    return 1 + int(math.ceil((n_samples - frame_len) / frame_step))


def samples_for_frames(n_frames: int, win_len: float, win_shift: float, rate: int) -> int:
    """Sample count that yields exactly ``n_frames`` frames.

    Matches the reference's training-crop arithmetic
    ``duration = (frame - 1) * win_shift + win_len`` at
    ``models/audio_models/datasets.py:113-115``.
    """
    return int(((n_frames - 1) * win_shift + win_len) * rate)


def preemphasis(signal: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """First-order high-pass pre-emphasis along the last axis."""
    first = signal[..., :1]
    rest = signal[..., 1:] - coeff * signal[..., :-1]
    return jnp.concatenate([first, rest], axis=-1)


def pad_for_frames(signal: jnp.ndarray, frame_len: int, frame_step: int) -> jnp.ndarray:
    """Zero-pad the last axis so an integral number of frames covers it."""
    n = signal.shape[-1]
    t = num_frames(n, frame_len, frame_step)
    pad = (t - 1) * frame_step + frame_len - n
    if pad <= 0:
        return signal
    widths = [(0, 0)] * (signal.ndim - 1) + [(0, pad)]
    return jnp.pad(signal, widths)


def sliding_frames(
    signal: jnp.ndarray, frame_len: int, frame_step: int, n_frames: int
) -> jnp.ndarray:
    """``(..., S) -> (..., n_frames, frame_len)`` overlapping windows.

    Implemented with reshapes + K = ceil(frame_len/step) shifted slices and a
    concat (an ``as_strided`` expressed in XLA-friendly ops) instead of a 2-D
    gather: compiles in milliseconds and fuses into the downstream window/DFT
    matmul, where a (T, frame_len) index gather does not.
    """
    k = math.ceil(frame_len / frame_step)
    need = (n_frames - 1 + k) * frame_step
    pad = need - signal.shape[-1]
    if pad > 0:
        widths = [(0, 0)] * (signal.ndim - 1) + [(0, pad)]
        signal = jnp.pad(signal, widths)
    elif pad < 0:
        signal = signal[..., :need]
    rows = signal.reshape(*signal.shape[:-1], n_frames - 1 + k, frame_step)
    blocks = jnp.concatenate(
        [rows[..., i : i + n_frames, :] for i in range(k)], axis=-1
    )
    return blocks[..., :frame_len]


def frame_signal(signal: jnp.ndarray, frame_len: int, frame_step: int) -> jnp.ndarray:
    """Slice ``(..., S)`` into overlapping frames ``(..., T, frame_len)``
    with the zero-pad-to-cover convention of :func:`num_frames`."""
    # sliding_frames zero-pads to (T-1+k)·step itself, which always covers
    # pad_for_frames' (T-1)·step+frame_len target — no pre-pad needed
    t = num_frames(signal.shape[-1], frame_len, frame_step)
    return sliding_frames(signal, frame_len, frame_step, t)
