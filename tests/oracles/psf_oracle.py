"""Independent NumPy oracle for the audio front-end parity tests.

python_speech_features / librosa are not installed in this environment, so
this module re-implements their documented algorithms (MFCC per the classic
HTK-style recipe with the python_speech_features conventions; centered Hann
STFT per librosa) directly in float64 NumPy, written from the published math:

- pre-emphasis y[t] = x[t] - a*x[t-1], y[0] = x[0]
- framing: round-half-up window/hop in samples; num_frames =
  1 + ceil((S - L)/H) with zero padding; NO analysis window for MFCC/fbank
- power spectrum |rfft(frame, nfft)|^2 / nfft
- mel scale 2595*log10(1+f/700); triangular filters anchored at
  floor((nfft+1)*f/rate) integer bins
- MFCC: log mel energies -> DCT-II(ortho) -> first numcep -> sinusoidal
  lifter 1+(L/2)sin(pi*n/L) -> optional c0 := log(sum power) (appendEnergy)
- deltas: d[t] = sum_k k*(x[t+k]-x[t-k]) / (2*sum k^2), edge padded
- librosa stft: reflect-pad nfft//2, periodic Hann of win_length centered in
  the nfft frame, 1 + S//hop columns

It deliberately shares no code with deeplip_tpu (pure numpy, scalar loops
where natural) so agreement is meaningful.
"""

import numpy as np


def _round_half_up(x):
    return int(np.floor(x + 0.5))


def preemphasis(sig, coeff=0.97):
    return np.append(sig[0], sig[1:] - coeff * sig[:-1])


def frame_signal(sig, frame_len, frame_step):
    slen = len(sig)
    if slen <= frame_len:
        n = 1
    else:
        n = 1 + int(np.ceil((slen - frame_len) / frame_step))
    padlen = (n - 1) * frame_step + frame_len
    padded = np.concatenate([sig, np.zeros(padlen - slen)])
    frames = np.empty((n, frame_len))
    for t in range(n):
        frames[t] = padded[t * frame_step : t * frame_step + frame_len]
    return frames


def powspec(frames, nfft):
    return (np.abs(np.fft.rfft(frames, nfft)) ** 2) / nfft


def hz2mel(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def mel2hz(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def filterbank(nfilt, nfft, rate, lowfreq=0, highfreq=None):
    highfreq = highfreq or rate / 2
    melpts = np.linspace(hz2mel(lowfreq), hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpts) / rate).astype(int)
    fb = np.zeros((nfilt, nfft // 2 + 1))
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fb[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            fb[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fb


def fbank(sig, rate=16000, winlen=0.025, winstep=0.01, nfilt=26, nfft=512, preemph=0.97):
    sig = preemphasis(sig, preemph)
    frames = frame_signal(sig, _round_half_up(winlen * rate), _round_half_up(winstep * rate))
    ps = powspec(frames, nfft)
    energy = ps.sum(axis=1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    feat = ps @ filterbank(nfilt, nfft, rate).T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    return feat, energy


def logfbank(sig, rate=16000, winlen=0.025, winstep=0.01, nfilt=26, nfft=512):
    feat, _ = fbank(sig, rate, winlen, winstep, nfilt, nfft)
    return np.log(feat)


def dct2_ortho(x):
    n_in = x.shape[1]
    n = np.arange(n_in)[:, None]
    k = np.arange(n_in)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    scale = np.full(n_in, np.sqrt(1.0 / (2 * n_in)))
    scale[0] = np.sqrt(1.0 / (4 * n_in))
    return (x @ mat) * scale


def lifter(cep, L=22):
    if L <= 0:
        return cep
    n = np.arange(cep.shape[1])
    return cep * (1 + (L / 2.0) * np.sin(np.pi * n / L))


def mfcc(sig, rate=16000, winlen=0.025, winstep=0.01, numcep=24, nfilt=26, nfft=512,
         append_energy=True, ceplifter=22):
    feat, energy = fbank(sig, rate, winlen, winstep, nfilt, nfft)
    cep = lifter(dct2_ortho(np.log(feat))[:, :numcep], ceplifter)
    if append_energy:
        cep[:, 0] = np.log(energy)
    return cep


def delta(feat, N):
    denom = 2 * sum(i * i for i in range(1, N + 1))
    padded = np.pad(feat, ((N, N), (0, 0)), mode="edge")
    out = np.zeros_like(feat)
    for t in range(len(feat)):
        out[t] = np.arange(-N, N + 1) @ padded[t : t + 2 * N + 1] / denom
    return out


def librosa_stft_log1p(sig, rate=16000, n_fft=512, winlen=0.025, winstep=0.01):
    """Centered STFT magnitude with log1p, time-major (librosa conventions)."""
    win_length = int(rate * winlen)
    hop = int(rate * winstep)
    pad = n_fft // 2
    padded = np.pad(sig, (pad, pad), mode="reflect")
    n_cols = 1 + len(sig) // hop
    n = np.arange(win_length)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)  # periodic hann
    full_win = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    full_win[off : off + win_length] = window
    need = (n_cols - 1) * hop + n_fft
    if need > len(padded):
        padded = np.concatenate([padded, np.zeros(need - len(padded))])
    mags = np.empty((n_cols, n_fft // 2 + 1))
    for t in range(n_cols):
        frame = padded[t * hop : t * hop + n_fft] * full_win
        mags[t] = np.abs(np.fft.rfft(frame, n_fft))
    return np.log1p(mags)


def cmvn(feat):
    return (feat - feat.mean(axis=0)) / (feat.std(axis=0) + 2e-12)
