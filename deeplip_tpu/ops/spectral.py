"""Spectral transform matrices: DFT, mel filterbank, DCT, liftering.

TPU-first design note: on TPU the FLOPs live in the MXU, so the real DFT is
expressed as two dense matmuls against precomputed cos/sin bases instead of a
scalar FFT butterfly. For speech-sized transforms (n_fft = 512 → a
``(frame_len, 257)`` basis) the "naive" O(N·K) matmul is a single MXU tile
pass and fuses with the surrounding window/mel/log elementwise work; it is
also bit-deterministic, which the parity tests rely on.

Numerical conventions replicate what the reference gets from its DSP
dependencies (``python_speech_features`` and ``librosa``, imported at
``models/audio_models/datasets.py:6-7``):

- mel scale ``2595 log10(1 + hz/700)`` with filterbank bin edges
  ``floor((nfft + 1) * hz / rate)`` (python_speech_features convention),
- DCT-II with 'ortho' norm for MFCC,
- cepstral lifter ``1 + (L/2) sin(pi n / L)``,
- periodic Hann window for the librosa-style STFT path.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def rdft_matrices(frame_len: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: ``(frame_len, n_fft//2+1)`` cos and -sin matrices.

    ``frames @ cos_mat + 1j * frames @ sin_mat == rfft(frames, n_fft)`` for
    frames of length ``frame_len <= n_fft`` (implicit zero-padding to n_fft).
    """
    if frame_len > n_fft:
        raise ValueError(f"frame_len {frame_len} > n_fft {n_fft}")
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(frame_len)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float64), (-np.sin(ang)).astype(np.float64)


@lru_cache(maxsize=None)
def rdft_fused_matrix(frame_len: int, n_fft: int) -> np.ndarray:
    """Column-concatenated rDFT basis ``[cos | -sin]``, ``(frame_len, 2K)``.

    ``frames @ rdft_fused_matrix(...)`` computes re and im in ONE matmul:
    each output column is the same dot product the two-matmul form produces
    (``re = out[..., :K]``, ``im = out[..., K:]``; values agree to ~1 ulp —
    only N-dependent gemm tiling can reorder accumulation) — and the TPU
    lane padding shrinks: two N=257 matmuls pad to 384 lanes each (768
    total) while the fused N=514 pads to 640.
    """
    cos_m, sin_m = rdft_matrices(frame_len, n_fft)
    return np.concatenate([cos_m, sin_m], axis=1)


@lru_cache(maxsize=None)
def rdft_packed_matrix(frame_len: int, n_fft: int) -> np.ndarray:
    """Nyquist-packed fused rDFT basis, shape ``(frame_len, n_fft)``.

    Layout: ``[cos[:, :K-1] | -sin[:, :K-1]]`` (``K = n_fft//2 + 1``) with the
    all-zero ``-sin`` column 0 **replaced by the Nyquist cos column**
    ``cos(pi*n) = (-1)^n``. Rationale (TPU lane geometry): the plain bases
    have K = 257 output columns, which the (8, 128) tile pads to 384 lanes —
    1.5x wasted MXU columns; the packed basis has exactly ``n_fft`` columns
    (512 = 4 lane tiles at the speech default), zero pad waste, and loses no
    information used by the mel front-ends:

    - ``sin`` column 0 is identically zero (``sin(0) = 0``), so the slot is
      free; the true ``im[0]`` is 0.
    - ``sin`` column K-1 is zero to float-pi rounding (|.| < 2e-13) and the
      mel filterbank's Nyquist row is structurally all-zero under the psf
      ``floor((n_fft+1)hz/rate)`` edge convention (top edge bin <= n_fft/2
      and triangles exclude their edge bins), so dropping it changes
      nothing the filterbank or total energy can observe beyond ~1e-26
      relative.
    - The squared-output row-sum then equals the TRUE 257-bin power-spectrum
      sum: ``sum(re[0:256]^2) + nyq^2 + sum(im[1:256]^2)`` — total energy
      (psf ``fbank``'s second output) falls out with no extra term.

    Use with ``mel_filterbank_packed`` (the matching row-stacked RHS); the
    stft front-end must NOT use this basis (it needs true re/im per bin).
    """
    cos_m, sin_m = rdft_matrices(frame_len, n_fft)
    k = n_fft // 2 + 1
    sin_mod = sin_m[:, : k - 1].copy()
    sin_mod[:, 0] = cos_m[:, k - 1]
    return np.concatenate([cos_m[:, : k - 1], sin_mod], axis=1)


@lru_cache(maxsize=None)
def mel_filterbank_packed(
    n_filt: int,
    n_fft: int,
    rate: int,
    low_freq: float = 0.0,
    high_freq: float | None = None,
) -> np.ndarray:
    """Row-stacked ``[fb[:K-1]; fb[:K-1]]`` filterbank, shape ``(n_fft, n_filt)``.

    RHS companion of ``rdft_packed_matrix``: applied to the SQUARED packed
    rDFT output it computes ``(re^2 + im^2) @ fb`` exactly — the packed
    column 256 (which carries the Nyquist power) meets filterbank row 0,
    which is structurally all-zero (left edge bin of the first triangle has
    weight 0), so the packing never leaks into the mel energies. Raises if
    the structural-zero assumption is violated (it cannot be under the psf
    edge convention with ``high_freq <= rate/2``).
    """
    fb = mel_filterbank(n_filt, n_fft, rate, low_freq, high_freq)
    k = n_fft // 2 + 1
    if fb[0].any() or fb[k - 1].any():
        raise ValueError(
            "packed rDFT requires all-zero filterbank rows at bin 0 and the "
            "Nyquist bin; this filterbank violates that (high_freq > rate/2?) "
            "— use dft='matmul' or 'matmul_fused'"
        )
    lo = fb[: k - 1]
    return np.concatenate([lo, lo], axis=0)


@lru_cache(maxsize=None)
def mel_filterbank_fused(
    n_filt: int,
    n_fft: int,
    rate: int,
    low_freq: float = 0.0,
    high_freq: float | None = None,
) -> np.ndarray:
    """Row-stacked ``[fb; fb]`` filterbank, shape ``(2K, n_filt)``.

    Applied to the SQUARED fused-rDFT output it folds the ``re² + im²``
    reduction into the mel matmul's own contraction:
    ``(out²) @ [fb; fb] == (re² + im²) @ fb`` — which avoids slicing the
    fused matmul's lane dimension at the non-128-aligned column K=257.
    """
    fb = mel_filterbank(n_filt, n_fft, rate, low_freq, high_freq)
    return np.concatenate([fb, fb], axis=0)


@lru_cache(maxsize=None)
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window; ``periodic=True`` matches librosa/scipy ``fftbins=True``."""
    denom = win_length if periodic else win_length - 1
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)).astype(np.float64)


def hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=None)
def mel_filterbank(
    n_filt: int,
    n_fft: int,
    rate: int,
    low_freq: float = 0.0,
    high_freq: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_fft//2+1, n_filt)``.

    Uses the python_speech_features edge convention: filter corner bins are
    ``floor((n_fft + 1) * hz / rate)`` so triangles are anchored to integer
    FFT bins (this differs from librosa's continuous-frequency triangles and
    matters for exact parity with the reference's MFCC front-end).
    """
    high_freq = high_freq or rate / 2.0
    mel_points = np.linspace(hz_to_mel(low_freq), hz_to_mel(high_freq), n_filt + 2)
    bins = np.floor((n_fft + 1) * mel_to_hz(mel_points) / rate).astype(np.int64)
    fb = np.zeros((n_filt, n_fft // 2 + 1), dtype=np.float64)
    for j in range(n_filt):
        for i in range(bins[j], bins[j + 1]):
            fb[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            fb[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fb.T.copy()


@lru_cache(maxsize=None)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix of shape ``(n_in, n_out)``.

    ``log_mel @ dct_matrix(numcep, nfilt)`` equals
    ``scipy.fftpack.dct(log_mel, type=2, norm='ortho', axis=-1)[..., :numcep]``.
    """
    n = np.arange(n_in)[:, None]
    k = np.arange(n_out)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2.0 * n + 1) / (2.0 * n_in))
    scale = np.full((1, n_out), np.sqrt(1.0 / (2.0 * n_in)))
    scale[0, 0] = np.sqrt(1.0 / (4.0 * n_in))
    return (mat * scale).astype(np.float64)


@lru_cache(maxsize=None)
def cepstral_lifter(n_cep: int, lifter: int = 22) -> np.ndarray:
    """Sinusoidal lifter weights ``1 + (L/2) sin(pi n / L)``, shape (n_cep,)."""
    if lifter <= 0:
        return np.ones((n_cep,), dtype=np.float64)
    n = np.arange(n_cep)
    return (1.0 + (lifter / 2.0) * np.sin(np.pi * n / lifter)).astype(np.float64)
