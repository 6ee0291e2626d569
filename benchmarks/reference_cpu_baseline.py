"""Measure the reference-equivalent CPU PyTorch verification throughput.

BASELINE.md's protocol: the reference repo publishes no numbers, so the
comparison point is its own pipeline measured locally — per-utterance CPU
MFCC (python_speech_features-equivalent NumPy), a torch E-TDNN forward at
``batch_size=1`` (the reference's test loaders, ``train_audio.py:97-100``),
and a per-trial Python cosine loop (``models/audio_models/utils.py:234-249``).

This torch model is written fresh from the architecture description
(conv1d stack with the reference's context/dilation derivation, statistics
pooling, two FC layers); it exists only to time an equivalent workload, not
to be bit-identical.

Usage: python benchmarks/reference_cpu_baseline.py [n_utts_sample]
Prints a JSON dict with per-stage timings extrapolated to the LOMGRID sweep
(3,541 unique utterances, 20,000 trials).
"""

import json
import sys
import time

import numpy as np

N_UNIQUE_UTTS = 3541
N_TRIALS = 20000
UTT_SECONDS = 3.0
RATE = 16000


def numpy_mfcc(sig):
    """python_speech_features-equivalent MFCC-24 (see tests/oracles)."""
    sig = np.append(sig[0], sig[1:] - 0.97 * sig[:-1])
    frame_len, step, nfft, nfilt, numcep = 400, 160, 512, 26, 24
    n = 1 + int(np.ceil((len(sig) - frame_len) / step)) if len(sig) > frame_len else 1
    padded = np.concatenate([sig, np.zeros((n - 1) * step + frame_len - len(sig))])
    idx = np.arange(n)[:, None] * step + np.arange(frame_len)[None, :]
    frames = padded[idx]
    ps = (np.abs(np.fft.rfft(frames, nfft)) ** 2) / nfft
    energy = np.maximum(ps.sum(1), np.finfo(float).eps)
    mel = lambda hz: 2595 * np.log10(1 + hz / 700)
    imel = lambda m: 700 * (10 ** (m / 2595) - 1)
    pts = np.floor((nfft + 1) * imel(np.linspace(mel(0), mel(RATE / 2), nfilt + 2)) / RATE).astype(int)
    fb = np.zeros((nfilt, nfft // 2 + 1))
    for j in range(nfilt):
        fb[j, pts[j]:pts[j + 1]] = (np.arange(pts[j], pts[j + 1]) - pts[j]) / max(pts[j + 1] - pts[j], 1)
        fb[j, pts[j + 1]:pts[j + 2]] = (pts[j + 2] - np.arange(pts[j + 1], pts[j + 2])) / max(pts[j + 2] - pts[j + 1], 1)
    feat = np.log(np.maximum(ps @ fb.T, np.finfo(float).eps))
    from scipy.fftpack import dct

    cep = dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
    lift = 1 + 11 * np.sin(np.pi * np.arange(numcep) / 22)
    cep = cep * lift
    cep[:, 0] = np.log(energy)
    return (cep - cep.mean(0)) / (cep.std(0) + 2e-12)


def build_torch_etdnn():
    import torch.nn as nn

    specs = [  # (kernel, dilation) per E-TDNN context spec
        (5, 1), (1, 1), (3, 2), (1, 1), (3, 3), (1, 1), (3, 4), (1, 1), (1, 1), (1, 1),
    ]
    dims = [24, 512, 512, 512, 512, 512, 512, 512, 512, 512, 1500]

    class ETDNN(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            for i, (k, d) in enumerate(specs):
                layers += [
                    nn.Conv1d(dims[i], dims[i + 1], k, dilation=d),
                    nn.BatchNorm1d(dims[i + 1]),
                    nn.LeakyReLU(0.2),
                ]
            self.tdnn = nn.Sequential(*layers)
            self.fc1 = nn.Linear(3000, 512)
            self.bn1 = nn.BatchNorm1d(512)
            self.act = nn.LeakyReLU(0.2)
            self.fc2 = nn.Linear(512, 512)

        def forward(self, x):
            import torch

            h = self.tdnn(x)
            stats = torch.cat([h.mean(2), h.std(2)], 1)
            return self.fc2(self.act(self.bn1(self.fc1(stats))))

    return ETDNN().eval()


def build_torch_lipreader():
    """Fresh torch equivalent of the reference video embedder in its
    fusion-eval role (``Lipreading(extract_feats=True)``): Conv3D frontend
    (5,7,7)/(1,2,2) + BN + PReLU + MaxPool3d (``models/video_models/
    model.py:81-85``) → per-frame stemless ResNet-18 trunk (BasicBlock
    [2,2,2,2], PReLU, ``resnet.py``) → global avg-pool → (T, 512) frame
    features. Written from the architecture description to time an
    equivalent workload, not to be bit-identical."""
    import torch
    import torch.nn as nn

    class Basic(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.a1 = nn.PReLU(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)
            self.a2 = nn.PReLU(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            r = self.down(x) if self.down else x
            y = self.b2(self.c2(self.a1(self.b1(self.c1(x)))))
            return self.a2(y + r)

    class Lip(nn.Module):
        def __init__(self):
            super().__init__()
            self.front = nn.Sequential(
                nn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
                nn.BatchNorm3d(64),
                nn.PReLU(64),
                nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            )
            blocks = []
            cin = 64
            for cout, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
                blocks += [Basic(cin, cout, stride), Basic(cout, cout, 1)]
                cin = cout
            self.trunk = nn.Sequential(*blocks)

        def forward(self, v):  # (1, 1, T, H, W)
            x = self.front(v)                       # (1, 64, T, H', W')
            b, c, t, h, w = x.shape
            x = x.transpose(1, 2).reshape(b * t, c, h, w)
            x = self.trunk(x)
            x = x.mean(dim=(2, 3))                  # (T, 512)
            return x

    return Lip().eval()


def main_av(n_clips: int = 8, t_frames: int = 50):
    """Per-clip batch-1 video extraction cost (the reference's AV eval loop,
    ``train_fusion.py:341-349``: one ``model_video(v)`` call per clip) —
    feeds the AV bench profile's CPU baseline (``bench.py`` BENCH_PROFILE=av).
    """
    import torch

    model = build_torch_lipreader()
    rng = np.random.default_rng(1)
    clips = [rng.standard_normal((t_frames, 88, 88)).astype(np.float32)
             for _ in range(n_clips)]
    with torch.no_grad():
        model(torch.tensor(clips[0][None, None]))  # warm-up
    t0 = time.perf_counter()
    with torch.no_grad():
        for c in clips:
            em = model(torch.tensor(c[None, None]))
            em.mean(0).numpy()
    dt = time.perf_counter() - t0
    out = {
        "sec_per_clip_video": dt / n_clips,
        "sec_per_frame_video": dt / n_clips / t_frames,
        "t_frames": t_frames,
        "n_clips_sampled": n_clips,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(out, indent=2))
    return out


def main(n_sample: int = 30):
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = build_torch_etdnn()
    rng = np.random.default_rng(0)
    sigs = [rng.standard_normal(int(UTT_SECONDS * RATE)).astype(np.float64) for _ in range(n_sample)]

    # warm up
    with torch.no_grad():
        feat = numpy_mfcc(sigs[0])
        model(torch.tensor(feat.T[None], dtype=torch.float32))

    t0 = time.perf_counter()
    embs = []
    with torch.no_grad():
        for sig in sigs:
            feat = numpy_mfcc(sig)
            xv = model(torch.tensor(feat.T[None], dtype=torch.float32))
            embs.append(torch.nn.functional.normalize(xv).numpy())
    t_extract = time.perf_counter() - t0

    # per-trial scoring loop cost (sklearn cosine per pair, like the reference)
    from sklearn.metrics.pairwise import cosine_similarity

    pool = np.concatenate(embs)
    n_score_sample = 2000
    t0 = time.perf_counter()
    for i in range(n_score_sample):
        a = pool[i % len(pool)].reshape(1, -1)
        b = pool[(i * 7 + 1) % len(pool)].reshape(1, -1)
        cosine_similarity(a, b)
    t_score = time.perf_counter() - t0

    extract_total = t_extract / n_sample * N_UNIQUE_UTTS
    score_total = t_score / n_score_sample * N_TRIALS
    total = extract_total + score_total
    out = {
        "sec_per_utt_extract": t_extract / n_sample,
        "sec_per_trial_score": t_score / n_score_sample,
        "extrapolated_sweep_seconds": total,
        "trials_per_sec": N_TRIALS / total,
        "n_unique_utts": N_UNIQUE_UTTS,
        "n_trials": N_TRIALS,
        "torch_threads": __import__("torch").get_num_threads(),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    if "--av" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--av"]
        main_av(int(args[0]) if args else 8)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
