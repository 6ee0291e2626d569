"""Host-side audio IO: WAV decode/encode and resampling.

The reference reads audio through soundfile/libsndfile with random-offset
reads (``models/audio_models/datasets.py:46-50``) and resamples GRID's
44.1 kHz stereo to 16 kHz mono via librosa (``datasets.py:455-462``).
Neither library is present here; WAV parsing is implemented directly (PCM
16/24/32-bit and float32, via the stdlib ``wave`` header parser + NumPy
frame decode) with the same conventions: float32 in [-1, 1), channel 0 of
multi-channel files, ``start``/``stop`` sample offsets. Resampling is
polyphase (scipy), applied offline/host-side — it feeds the manifest stage,
never the device hot path. A C++ batched decoder (deeplip_tpu/native) can
replace the Python inner loop for manifest-scale prep.
"""

from __future__ import annotations

import wave

import numpy as np


def read_wav(
    path: str, start: int = 0, stop: int | None = None, mono: bool = True
) -> tuple[np.ndarray, int]:
    """Read a WAV file to float32; returns ``(samples, rate)``.

    ``start``/``stop`` are sample offsets like soundfile's (``sf.read`` at
    ``datasets.py:48``). Multi-channel files return channel 0 when ``mono``
    (the reference's ``y[:, 0]``, ``datasets.py:49``).
    """
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        stop = n_frames if stop is None else min(stop, n_frames)
        start = min(start, stop)
        w.setpos(start)
        raw = w.readframes(stop - start)

    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        # could be int32 PCM or float32; wave reports PCM only
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        data = ints.astype(np.float32) / 8388608.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:  # pragma: no cover
        raise ValueError(f"unsupported sample width {sampwidth}")

    if n_channels > 1:
        data = data.reshape(-1, n_channels)
        if mono:
            data = data[:, 0]
    return data, rate


def write_wav(path: str, data: np.ndarray, rate: int) -> None:
    """Write float32 [-1, 1] mono/stereo data as PCM16 WAV."""
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    pcm = np.clip(data * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(data.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def resample(data: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """Polyphase resampling (offline prep; ≙ librosa.resample usage at
    ``datasets.py:462``)."""
    if orig_rate == target_rate:
        return data
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_rate, target_rate)
    return resample_poly(data, target_rate // g, orig_rate // g).astype(np.float32)
