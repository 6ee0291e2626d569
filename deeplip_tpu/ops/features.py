"""Batched on-device audio feature extraction (MFCC / fbank / logfbank / STFT).

The reference extracts features per-utterance on the CPU inside DataLoader
worker processes (``models/audio_models/datasets.py:65-83``, dispatching on
``feat_type`` between python_speech_features ``mfcc``/``fbank``/``logfbank``
and librosa ``stft``+``magphase``+``log1p``), then normalizes per utterance
with ``(x - mean) / (std + 2e-12)`` (``datasets.py:52-53``) and optionally
appends delta/delta-delta (``datasets.py:55-63``).

Here the whole front-end is a jittable function of a ``(B, S)`` PCM batch:

    frames  = gather(signal)                  # (B, T, frame_len)
    spec    = (frames @ cos)^2 + (frames @ sin)^2     # MXU matmuls
    mel     = spec @ mel_fb                   # MXU matmul
    feat    = log(mel) @ dct * lifter         # MXU matmul (MFCC)

so XLA fuses window/square/log into the matmuls, the batch dimension is
shardable over the data mesh axis, and there is no per-utterance Python.
Numerical conventions match the reference's DSP libraries (see
``deeplip_tpu.ops.spectral``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from deeplip_tpu.ops import framing, spectral
from deeplip_tpu.ops.precision import comp_matmul

# python_speech_features guards log(0)/div-by-0 with numpy double eps.
_PSF_EPS = float(np.finfo(np.float64).eps)


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Static feature-extraction parameters (hashable → jit-static).

    Field names/defaults mirror ``conf/audio_config.yaml:26-59``:
    ``feat_type`` selects the front-end; ``num_bin`` is the mel filter count;
    ``num_cep`` the MFCC cepstra; ``energy`` replaces c0 with log-energy;
    ``normalize`` applies per-utterance CMVN; ``delta`` appends Δ/ΔΔ.
    """

    feat_type: str = "mfcc"
    rate: int = 16000
    n_fft: int = 512
    num_bin: int = 26
    num_cep: int = 24
    energy: bool = True
    normalize: bool = True
    delta: bool = False
    win_len: float = 0.025
    win_shift: float = 0.01
    preemph: float = 0.97
    ceplifter: int = 22
    low_freq: float = 0.0
    high_freq: float | None = None
    # matmul precision for the DFT/mel/DCT ops: 'highest' (6 MXU passes)
    # and 'high' (3) both hold the 1e-4 parity bar on TPU (trained-weight
    # budget: 2.47e-5 vs 2.56e-5 — use 'high'); 'wsplit2'/'asplit2'
    # (2-pass compensated, ops.precision) measure 5e-4 in that regime —
    # NOT parity-grade; 'default' (1 bf16 pass, 7.4e-4) is the training
    # setting. Measurements: docs/precision_budget_r03.md.
    precision: str = "highest"
    # rDFT implementation: 'matmul' (two MXU passes against cos/sin
    # bases, at `precision`), 'matmul_fused' (ONE pass against the
    # [cos|-sin] basis, re²+im² folded into a row-stacked mel matmul —
    # 1.2x less lane-padded DFT work), 'matmul_packed' (the fused basis
    # with the Nyquist cos column packed into the all-zero sin column 0 —
    # exactly n_fft output columns, ZERO lane padding, 1.5x less DFT MXU
    # work than 'matmul'; mel front-ends only, stft falls back to the
    # exact bases), or 'fft' (`jnp.fft.rfft` — native-f32 accuracy, immune
    # to the bf16-pass precision tax; mel/DCT matmuls keep `precision`).
    # MEASURED (benchmarks/precision_budget.py, trained regime, v5e,
    # 256x3s batches): 'fft' holds the parity bar (2.7e-5) but XLA's
    # n_fft=512 TPU FFT is 1.5x SLOWER end-to-end (19.9 vs 13.2 ms);
    # 'matmul_fused' is +0.8% — real but below the rig's ~1.5% noise
    # floor; 'matmul_packed' (r4, fori-loop DSP probe at bs 256 'high')
    # measures 1.22 ms/batch vs matmul's 1.14 / fused's 1.10 — the zero-pad
    # DFT saving is outweighed by the mel matmul's contraction growing from
    # 384 to 512 padded rows, and the end-to-end headline moves +0.2%
    # (noise). 'matmul' stays the production default (keeps all committed
    # parity evidence byte-valid); details in docs/precision_budget_r03.md
    # addenda + BENCH.md r4.
    dft: str = "matmul"

    @classmethod
    def from_config(cls, data_opts: Mapping[str, Any]) -> "FeatureConfig":
        """Build from the reference-style nested audio data config.

        Accepts the ``python_data_config`` section layout of
        ``conf/audio_config.yaml`` (``rate``/``feat_type`` plus a per-type
        sub-dict selected by ``feat_type``).
        """
        rate = int(data_opts.get("rate", 16000))
        feat_type = data_opts.get("feat_type", "mfcc")
        sub = dict(data_opts.get(feat_type, {}))
        kw: dict[str, Any] = {"feat_type": feat_type, "rate": rate}
        # rDFT implementation is selectable at the top data-config level
        # (it is a device-efficiency choice, not a per-feat-type DSP param)
        if data_opts.get("dft"):
            kw["dft"] = str(data_opts["dft"])
        for src, dst in [
            ("n_fft", "n_fft"),
            ("num_bin", "num_bin"),
            ("num_cep", "num_cep"),
            ("energy", "energy"),
            ("normalize", "normalize"),
            ("delta", "delta"),
            ("win_len", "win_len"),
            ("win_shift", "win_shift"),
        ]:
            if src in sub:
                kw[dst] = sub[src]
        return cls(**kw)

    @property
    def frame_len(self) -> int:
        return framing.round_half_up(self.win_len * self.rate)

    @property
    def frame_step(self) -> int:
        return framing.round_half_up(self.win_shift * self.rate)


def feature_dim(cfg: FeatureConfig) -> int:
    """Output feature dimension for a config (before delta stacking)."""
    if cfg.feat_type == "mfcc":
        base = cfg.num_cep
    elif cfg.feat_type in ("fbank", "logfbank"):
        base = cfg.num_bin
    elif cfg.feat_type == "stft":
        base = cfg.n_fft // 2 + 1
    else:
        raise NotImplementedError(f"unknown feat_type {cfg.feat_type!r}")
    if cfg.delta:
        base *= 3
    return base


def _power_spectrum(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Pre-emphasis → frames → |rDFT|²/n_fft, shape ``(..., T, n_fft//2+1)``.

    python_speech_features applies no analysis window by default (its
    ``winfunc`` is all-ones), so none is applied here either.
    """
    emph = framing.preemphasis(signal, cfg.preemph)
    frames = framing.frame_signal(emph, cfg.frame_len, cfg.frame_step)
    re, im = _rdft(frames, cfg.frame_len, cfg)
    return (re * re + im * im) / cfg.n_fft


def _rdft(frames: jnp.ndarray, frame_len: int, cfg: FeatureConfig):
    """Real DFT of ``(..., T, frame_len)`` frames → (re, im) ``(..., T, n_fft//2+1)``.

    ``cfg.dft='matmul'``: two dense MXU passes against precomputed bases at
    ``cfg.precision`` (the fusable, bit-deterministic default — see
    ``ops.spectral``). ``cfg.dft='fft'``: ``jnp.fft.rfft`` with implicit
    zero-pad to ``n_fft`` — native f32 arithmetic, so it is immune to the
    bf16 MXU rounding that forces the matmul path to 3+ passes
    (docs/precision_budget_r03.md). Measured on the v5e it is ~1.5x
    SLOWER end-to-end than the 3-pass matmul despite ~45x fewer FLOPs
    (XLA's small-size FFT underutilizes the chip), so it stays opt-in.
    """
    if cfg.dft == "fft":
        spec = jnp.fft.rfft(frames, n=cfg.n_fft)
        return jnp.real(spec).astype(frames.dtype), jnp.imag(spec).astype(frames.dtype)
    if cfg.dft == "matmul_fused":
        # one MXU pass over the [cos | -sin] basis (same per-column dot
        # products — see spectral.rdft_fused_matrix), split after. The split slices
        # the lane dim at the unaligned column K=257, so hot paths that
        # only need |·|² reductions should use _fused_rdft_sq + a
        # row-stacked right-hand matrix instead (_mel_energies does).
        fused = _fused_rdft_sq(frames, frame_len, cfg, square=False)
        k = cfg.n_fft // 2 + 1
        return fused[..., :k], fused[..., k:]
    if cfg.dft not in ("matmul", "matmul_packed"):
        raise NotImplementedError(f"unknown dft impl {cfg.dft!r}")
    # 'matmul_packed' reaching here means a caller that needs TRUE per-bin
    # re/im (the stft front-end) — the packed basis is mel-front-end-only,
    # so serve the exact two-matmul bases instead.
    cos_m, sin_m = spectral.rdft_matrices(frame_len, cfg.n_fft)
    cos_m = jnp.asarray(cos_m, dtype=frames.dtype)
    sin_m = jnp.asarray(sin_m, dtype=frames.dtype)
    # cfg.precision='highest' (default): TPU f32 matmuls otherwise run as
    # bf16 MXU passes, which costs ~3 digits and breaks the 1e-4 parity bar.
    re = comp_matmul(frames, cos_m, cfg.precision)
    im = comp_matmul(frames, sin_m, cfg.precision)
    return re, im


def _fused_rdft_sq(frames: jnp.ndarray, frame_len: int, cfg: FeatureConfig,
                   square: bool = True) -> jnp.ndarray:
    """Fused-basis rDFT ``(..., T, 2K)``: ``[re | im]`` (optionally squared).

    One ``comp_matmul`` against ``spectral.rdft_fused_matrix`` — each output
    column is the same dot product as the two-matmul ``_rdft`` path (agrees
    to ~1 ulp), at ~1.2× less lane-padded MXU work (640 vs 768 padded
    columns at n_fft=512).
    """
    basis = jnp.asarray(
        spectral.rdft_fused_matrix(frame_len, cfg.n_fft), dtype=frames.dtype)
    out = comp_matmul(frames, basis, cfg.precision)
    return out * out if square else out


def _mel_energies(signal: jnp.ndarray, cfg: FeatureConfig):
    if cfg.dft == "matmul_packed":
        # Nyquist-packed fused basis: ONE (frame_len, n_fft) matmul with
        # ZERO lane padding (512 output columns = 4 exact 128-lane tiles at
        # the speech default vs 'matmul's 2x384 padded / 'matmul_fused's
        # 640). Exactness: the squared-column row-sum equals the true
        # 257-bin power sum (energy), and the row-stacked [fb_lo; fb_lo]
        # meets the packed Nyquist column at the structurally-zero
        # filterbank row 0 (see spectral.rdft_packed_matrix docstring).
        emph = framing.preemphasis(signal, cfg.preemph)
        frames = framing.frame_signal(emph, cfg.frame_len, cfg.frame_step)
        fb2 = jnp.asarray(
            spectral.mel_filterbank_packed(
                cfg.num_bin, cfg.n_fft, cfg.rate, cfg.low_freq, cfg.high_freq),
            dtype=frames.dtype,
        )
        basis = jnp.asarray(
            spectral.rdft_packed_matrix(cfg.frame_len, cfg.n_fft),
            dtype=frames.dtype,
        )
        out = comp_matmul(frames, basis, cfg.precision)
        sq = out * out
        energy = jnp.sum(sq, axis=-1) / cfg.n_fft
        energy = jnp.where(energy == 0, _PSF_EPS, energy)
        feat = comp_matmul(sq, fb2, cfg.precision) / cfg.n_fft
        feat = jnp.where(feat == 0, _PSF_EPS, feat)
        return feat, energy
    if cfg.dft == "matmul_fused":
        # fused path: |rDFT|² never materializes per-bin — the re²+im²
        # fold rides the mel matmul's contraction over the row-stacked
        # [fb; fb] (spectral.mel_filterbank_fused), and the total energy
        # is the plain sum over all 2K squared columns. Avoids both the
        # second DFT matmul's lane padding and any unaligned lane slice.
        emph = framing.preemphasis(signal, cfg.preemph)
        frames = framing.frame_signal(emph, cfg.frame_len, cfg.frame_step)
        sq = _fused_rdft_sq(frames, cfg.frame_len, cfg)
        energy = jnp.sum(sq, axis=-1) / cfg.n_fft
        energy = jnp.where(energy == 0, _PSF_EPS, energy)
        fb2 = jnp.asarray(
            spectral.mel_filterbank_fused(
                cfg.num_bin, cfg.n_fft, cfg.rate, cfg.low_freq, cfg.high_freq),
            dtype=sq.dtype,
        )
        feat = comp_matmul(sq, fb2, cfg.precision) / cfg.n_fft
        feat = jnp.where(feat == 0, _PSF_EPS, feat)
        return feat, energy
    pspec = _power_spectrum(signal, cfg)
    energy = jnp.sum(pspec, axis=-1)
    energy = jnp.where(energy == 0, _PSF_EPS, energy)
    fb = jnp.asarray(
        spectral.mel_filterbank(cfg.num_bin, cfg.n_fft, cfg.rate, cfg.low_freq, cfg.high_freq),
        dtype=pspec.dtype,
    )
    feat = comp_matmul(pspec, fb, cfg.precision)
    feat = jnp.where(feat == 0, _PSF_EPS, feat)
    return feat, energy


def fbank(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Linear mel filterbank energies ``(..., T, num_bin)`` (not log)."""
    feat, _ = _mel_energies(signal, cfg)
    return feat


def logfbank(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    feat, _ = _mel_energies(signal, cfg)
    return jnp.log(feat)


def mfcc(signal: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """MFCC ``(..., T, num_cep)`` with liftering and optional log-energy c0."""
    feat, energy = _mel_energies(signal, cfg)
    logm = jnp.log(feat)
    dct = jnp.asarray(spectral.dct_matrix(cfg.num_cep, cfg.num_bin), dtype=logm.dtype)
    cep = comp_matmul(logm, dct, cfg.precision)
    lift = jnp.asarray(spectral.cepstral_lifter(cfg.num_cep, cfg.ceplifter), dtype=cep.dtype)
    cep = cep * lift
    if cfg.energy:
        cep = cep.at[..., 0].set(jnp.log(energy))
    return cep


def stft_features(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    sample_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """librosa-style log1p STFT magnitude ``(..., T, n_fft//2+1)``.

    Matches the reference's stft branch (``datasets.py:72-76``): centered
    frames with reflect padding, periodic Hann of ``win_len`` samples padded
    to ``n_fft``, magnitude, ``log1p``, time-major output.

    ``sample_lengths`` (r5, closes the PARITY.md stft bucketed-eval
    deviation): in a zero-padded batch, librosa's centered reflect framing
    must reflect around each row's TRUE signal end, not the batch pad — the
    last ~``n_fft/(2·hop)`` frames of every utterance otherwise see pad
    zeros. With lengths given, the reflect-padded buffer is built as one
    in-graph gather: padded position ``p`` maps to source index
    ``fold(p - n_fft//2, L)`` where ``fold`` is numpy's 'reflect' triangle
    fold with period ``2L-2`` (multi-fold exact for ``L < n_fft//2``). Each
    row's first ``1 + L//hop`` frames are then bit-identical to
    per-utterance extraction (frames beyond carry finite fold values the
    masked CMVN/pooling exclude). Rows at full buffer length reproduce the
    unmasked path exactly, so parity evidence is unchanged.
    """
    win_length = int(cfg.rate * cfg.win_len)
    hop = int(cfg.rate * cfg.win_shift)
    pad = cfg.n_fft // 2
    # librosa frames the centered signal into ceil-free 1 + (len // hop) cols
    n_cols = 1 + signal.shape[-1] // hop
    if sample_lengths is not None:
        # per-row reflect framing around the true signal end, as one gather:
        # build exactly the buffer length sliding_frames consumes
        k = -(-cfg.n_fft // hop)  # ceil
        need = (n_cols - 1 + k) * hop
        lengths = jnp.asarray(sample_lengths)[..., None]          # (..., 1)
        pos = jnp.arange(need) - pad                              # (need,)
        period = jnp.maximum(2 * (lengths - 1), 1)
        m = jnp.mod(pos, period)                                  # (..., need)
        idx = jnp.where(m >= lengths, period - m, m)
        idx = jnp.clip(idx, 0, signal.shape[-1] - 1).astype(jnp.int32)
        padded = jnp.take_along_axis(signal, idx, axis=-1)
    else:
        widths = [(0, 0)] * (signal.ndim - 1) + [(pad, pad)]
        padded = jnp.pad(signal, widths, mode="reflect")
        need = (n_cols - 1) * hop + cfg.n_fft
        if need > padded.shape[-1]:
            extra = [(0, 0)] * (signal.ndim - 1) + [(0, need - padded.shape[-1])]
            padded = jnp.pad(padded, extra)
    frames = framing.sliding_frames(padded, cfg.n_fft, hop, n_cols)
    window = spectral.hann_window(win_length, periodic=True)
    # center the window inside the n_fft frame, zero elsewhere (librosa util.pad_center)
    full = np.zeros((cfg.n_fft,), dtype=np.float64)
    off = (cfg.n_fft - win_length) // 2
    full[off : off + win_length] = window
    frames = frames * jnp.asarray(full, dtype=frames.dtype)
    re, im = _rdft(frames, cfg.n_fft, cfg)
    mag = jnp.sqrt(re * re + im * im)
    return jnp.log1p(mag)


def cmvn(feat: jnp.ndarray, eps: float = 2e-12) -> jnp.ndarray:
    """Per-utterance cepstral mean/variance normalization over time.

    Exact formula of the reference (``datasets.py:52-53``): population std
    (ddof=0) with ``+2e-12`` in the denominator.
    """
    mean = jnp.mean(feat, axis=-2, keepdims=True)
    std = jnp.std(feat, axis=-2, keepdims=True)
    return (feat - mean) / (std + eps)


def delta(feat: jnp.ndarray, n: int = 2) -> jnp.ndarray:
    """Regression-based delta features over time (python_speech_features).

    ``d[t] = sum_{k=1..n} k (x[t+k] - x[t-k]) / (2 sum k^2)`` with edge
    padding, matching ``psf.base.delta`` used at ``datasets.py:55-63``.
    """
    if n < 1:
        raise ValueError("delta order must be >= 1")
    denom = 2.0 * sum(k * k for k in range(1, n + 1))
    t_axis = feat.ndim - 2
    widths = [(0, 0)] * feat.ndim
    widths[t_axis] = (n, n)
    padded = jnp.pad(feat, widths, mode="edge")
    total = jnp.zeros_like(feat)
    t = feat.shape[t_axis]
    for k in range(-n, n + 1):
        if k == 0:
            continue
        sl = [slice(None)] * feat.ndim
        sl[t_axis] = slice(k + n, k + n + t)
        total = total + k * padded[tuple(sl)]
    return total / denom


def add_deltas(feat: jnp.ndarray, order: int = 2) -> jnp.ndarray:
    """Stack [feat, Δ, (ΔΔ)] on the channel axis (``datasets.py:55-63``)."""
    if order == 1:
        return jnp.concatenate([feat, delta(feat, 1)], axis=-1)
    if order == 2:
        return jnp.concatenate([feat, delta(feat, 1), delta(feat, 2)], axis=-1)
    raise ValueError("delta order must be 1 or 2")


def extract_features(
    signal: jnp.ndarray,
    cfg: FeatureConfig,
    backend: str = "xla",
    sample_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full front-end dispatch matching ``_extract_feature`` semantics
    (``datasets.py:65-83``): feature → optional CMVN → optional Δ/ΔΔ.

    Input ``(..., S)`` float PCM; output ``(..., T, D)`` time-major features.
    ``backend='pallas'`` routes the mel front-ends through the fused VMEM
    kernel (``ops.pallas.fbank_kernel``); 'xla' is the default matmul path.

    ``sample_lengths`` (leading-dims-shaped) marks the true PCM length of
    each row in a zero-padded batch. The reference pipeline pre-emphasizes
    the exact-length signal and zero-pads *after* (``psf.sigproc.framesig``
    via ``datasets.py:65-83``); pre-emphasizing padded PCM instead leaks
    ``-coeff·signal[n-1]`` into padding position ``n``, which always lands
    inside the last valid frame and breaks padded-vs-exact equality. With
    lengths given, pre-emphasis is applied here and masked, and the inner
    front-ends run with ``preemph=0`` (an exact no-op). The stft front-end
    never pre-emphasizes (reference: librosa.stft on raw PCM,
    ``datasets.py:73-76``); lengths instead drive its per-row reflect
    framing around the true signal end (see :func:`stft_features`), making
    each row's valid frames bit-equal to per-utterance extraction in padded
    batches (r5 — the bucketed-eval deviation PARITY.md used to document,
    now closed). Per-utterance
    statistics over a padded batch cannot be computed here (CMVN/deltas
    would average pad-derived frames): pass ``normalize=False``/
    ``delta=False`` and apply a masked CMVN downstream
    (``train.audio.masked_cmvn``).
    """
    if sample_lengths is not None and (cfg.normalize or cfg.delta):
        raise ValueError(
            "sample_lengths with cfg.normalize/cfg.delta would compute "
            "CMVN/delta statistics over padding-derived frames; use "
            "normalize=False, delta=False and a masked CMVN over the valid "
            "frames instead (see train.audio.masked_cmvn)"
        )
    if sample_lengths is not None and cfg.preemph and cfg.feat_type != "stft":
        emph = framing.preemphasis(signal, cfg.preemph)
        idx = jnp.arange(signal.shape[-1])
        mask = idx < jnp.asarray(sample_lengths)[..., None]
        signal = emph * mask.astype(signal.dtype)
        cfg = dataclasses.replace(cfg, preemph=0.0)
    if backend == "pallas" and cfg.feat_type in ("mfcc", "fbank", "logfbank"):
        from deeplip_tpu.ops.pallas.fbank_kernel import pallas_audio_features

        squeeze = signal.ndim == 1
        feat = pallas_audio_features(signal[None] if squeeze else signal, cfg)
        if squeeze:
            feat = feat[0]
    elif cfg.feat_type == "mfcc":
        feat = mfcc(signal, cfg)
    elif cfg.feat_type == "fbank":
        feat = fbank(signal, cfg)
    elif cfg.feat_type == "logfbank":
        feat = logfbank(signal, cfg)
    elif cfg.feat_type == "stft":
        feat = stft_features(signal, cfg, sample_lengths=sample_lengths)
    else:
        raise NotImplementedError(f"unknown feat_type {cfg.feat_type!r}")
    if cfg.normalize:
        feat = cmvn(feat)
    if cfg.delta:
        feat = add_deltas(feat, order=2)
    return feat
