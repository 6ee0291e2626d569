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
    (the reference's ``y[:, 0]``, ``datasets.py:49``). IEEE-float32 WAVs
    (librosa/soundfile output) are handled via a small RIFF parser — the
    stdlib ``wave`` module rejects format 3.
    """
    try:
        return _read_wav_stdlib(path, start, stop, mono)
    except wave.Error:
        return _read_wav_riff(path, start, stop, mono)


def _read_wav_stdlib(path, start, stop, mono):
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


def _read_wav_riff(path, start, stop, mono):
    """Minimal RIFF walk for formats stdlib wave rejects (IEEE float32,
    WAVE_FORMAT_EXTENSIBLE) — mirrors native/wavio.cpp parse_header."""
    import struct

    with open(path, "rb") as f:
        if f.read(4) != b"RIFF":
            raise ValueError(f"{path}: not a RIFF file")
        f.read(4)
        if f.read(4) != b"WAVE":
            raise ValueError(f"{path}: not a WAVE file")
        fmt = channels = rate = bits = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError(f"{path}: no data chunk")
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                buf = f.read(size)
                fmt, channels, rate = struct.unpack("<HHI", buf[:8])
                bits = struct.unpack("<H", buf[14:16])[0]
                if fmt == 0xFFFE and size >= 40:  # EXTENSIBLE: subformat tag
                    fmt = struct.unpack("<H", buf[24:26])[0]
            elif cid == b"data":
                if fmt is None:
                    raise ValueError(f"{path}: data before fmt chunk")
                frame_bytes = (bits // 8) * channels
                n_frames = size // frame_bytes
                stop2 = n_frames if stop is None else min(stop, n_frames)
                start2 = min(start, stop2)
                f.seek(start2 * frame_bytes, 1)
                raw = f.read((stop2 - start2) * frame_bytes)
                if fmt == 3 and bits == 32:
                    data = np.frombuffer(raw, dtype="<f4").astype(np.float32)
                elif fmt == 1 and bits == 16:
                    data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
                elif fmt == 1 and bits == 32:
                    data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
                else:
                    raise ValueError(
                        f"{path}: unsupported wav format {fmt}/{bits}-bit")
                if channels > 1:
                    data = data.reshape(-1, channels)
                    if mono:
                        data = data[:, 0]
                return data, rate
            else:
                f.seek(size + (size & 1), 1)


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
