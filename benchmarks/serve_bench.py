"""Serving-surface latency bench: enroll / verify / identify / AS-norm.

VERDICT r3 #5: the serving surface (``serve/verifier.py``, ``serve/av.py``,
``eval/snorm.py``, the ``deeplip-verify`` CLI) shipped in r3 with zero
measured latency numbers. This bench measures the real shipping code paths
— every call is the actual :class:`SpeakerVerifier` /
:class:`AVSpeakerVerifier` method a service would invoke, batch-1,
including Python-side bucketing, device dispatch, and the device→host
score fetch (each decision call ends in a host ``float()``, so wall-clock
per call is an honest synchronous measurement even on this rig's relay —
the fetch provably waits; see benchmarks/_timing.py).

Rig-vs-production framing (the same BENCH.md uses everywhere): on this
rig, per-call latency is dominated by the stdio-relay round-trip
(~0.3-0.5 s per dispatch); a production PCIe-attached TPU host pays ~1 ms
per dispatch. Report BOTH the measured p50/p95 and the per-call dispatch
count so the PCIe expectation is arithmetic, plus the offline AS-norm
cohort-scoring throughput, which is a single device program and transfers
only scores (rig-faithful).

Run (TPU):  python benchmarks/serve_bench.py --out docs/serve_bench_r04.json
Smoke (CPU): PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/serve_bench.py \
                 --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def _timed_calls(fn, n, *args, **kw):
    """Per-call wall times; each call internally fetches device→host."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args, **kw)
        times.append(time.perf_counter() - t0)
    return times


def _row(name, times, dispatches_per_call):
    return {
        "op": name,
        "n_calls": len(times),
        "p50_ms": round(_pct(times, 50) * 1e3, 2),
        "p95_ms": round(_pct(times, 95) * 1e3, 2),
        "dispatches_per_call": dispatches_per_call,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny models + few calls (CPU CI smoke)")
    ap.add_argument("--skip-av", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _train_config
    from deeplip_tpu.serve import SpeakerVerifier

    n_calls = 6 if args.smoke else 30
    utt_sec = 1.0 if args.smoke else 3.0
    rate = 16000
    rng = np.random.default_rng(0)

    cfg = _train_config(bs=8)
    if args.smoke:
        cfg.model["etdnn"]["hidden_dim"] = [32] * 9 + [64]
        cfg.model["etdnn"]["embedding_dim"] = 16
    cfg.train["n_spk"] = 1

    v = SpeakerVerifier(cfg)

    def pcm(seed, sec=utt_sec):
        r = np.random.default_rng(seed)
        return (0.1 * r.standard_normal(int(sec * rate))).astype(np.float32)

    report = {"rig": "stdio-relay tunnel" if not args.smoke else "cpu-smoke",
              "utt_seconds": utt_sec, "rows": []}

    # -- warm-up: compile the bucket shape + absorb the relay stall --------
    v.enroll("warm", pcm(999))
    v.score("warm", pcm(998))

    # -- enroll (single 3 s utterance) -------------------------------------
    times = _timed_calls(lambda i=[0]: (i.__setitem__(0, i[0] + 1),
                                        v.enroll(f"e{i[0]}", pcm(i[0])))[-1],
                         n_calls)
    report["rows"].append(_row("enroll_1utt", times, 1))

    # -- verify (profile vs probe) -----------------------------------------
    v.enroll("alice", [pcm(1), pcm(2)])
    v.threshold = 0.5
    times = _timed_calls(lambda: v.verify("alice", pcm(3)), n_calls)
    # embed dispatch only — the 2-vector cosine runs on the host numpy twin
    # (ProfileVerifier.host_score_macs, r4); it was a 2nd dispatch in r4a
    report["rows"].append(_row("verify", times, 1))

    # -- identify over N profiles ------------------------------------------
    n_prof = 10 if args.smoke else 100
    # enroll from precomputed embeddings directly (profile count is the
    # variable under test, not enrollment throughput)
    d = len(v.profiles["alice"])
    for i in range(n_prof):
        e = rng.standard_normal(d).astype(np.float32)
        v.profiles[f"p{i:03d}"] = e / np.linalg.norm(e)
    times = _timed_calls(lambda: v.identify(pcm(4), top_k=5), n_calls)
    report["rows"].append(_row(f"identify_{n_prof}profiles", times, 1))

    # -- verify under an AS-norm cohort -------------------------------------
    cohort = rng.standard_normal((64 if args.smoke else 300, d)).astype(np.float32)
    v.set_cohort(cohort, top_k=min(200, cohort.shape[0]))
    v.threshold = 0.0
    v.score("alice", pcm(5))  # compile cohort stats path
    # cohort-stat + normalize math also fits under the host cutoff at
    # these sizes: embed dispatch only (was 3 dispatches in r4a)
    times = _timed_calls(lambda: v.verify("alice", pcm(6)), n_calls)
    report["rows"].append(_row("verify_asnorm", times, 1))
    v.set_cohort(None)

    # -- offline AS-norm cohort-scoring throughput --------------------------
    from deeplip_tpu.eval.snorm import asnorm_trial_scores

    n_emb = 256 if args.smoke else 3541
    n_coh = 128 if args.smoke else 1024
    n_trials = 2000 if args.smoke else 20000
    emb = rng.standard_normal((n_emb, d)).astype(np.float32)
    coh = rng.standard_normal((n_coh, d)).astype(np.float32)
    pairs = rng.integers(0, n_emb, (n_trials, 2)).astype(np.int32)
    asnorm_trial_scores(emb, pairs, coh, top_k=200)  # compile
    t0 = time.perf_counter()
    k = 2 if args.smoke else 8
    for _ in range(k):
        scores = asnorm_trial_scores(emb, pairs, coh, top_k=200)
    dt = (time.perf_counter() - t0) / k
    assert np.all(np.isfinite(scores))
    report["asnorm_offline"] = {
        "n_embeddings": n_emb, "cohort": n_coh, "n_trials": n_trials,
        "trials_per_sec": round(n_trials / dt, 1),
        "ms_per_sweep": round(dt * 1e3, 2),
    }

    # -- AV pair path --------------------------------------------------------
    if not args.skip_av:
        report["rows"].extend(_av_rows(args, n_calls=max(4, n_calls // 3)))

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


def _av_rows(args, n_calls):
    import yaml

    from deeplip_tpu.serve import AVSpeakerVerifier

    rate = 16000
    rng = np.random.default_rng(7)
    tmp = tempfile.mkdtemp(prefix="serve_bench_av_")
    clip_shape = (8, 96, 96) if args.smoke else (29, 96, 96)

    video_cfg = {
        "extract_feats": True, "backbone_type": "resnet",
        "width_mult": 1.0, "relu_type": "prelu",
        "tcn_num_layers": 2 if args.smoke else 4,
        "tcn_kernel_size": [3] if args.smoke else [3, 5, 7],
        "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_width_mult": 1,
    }
    audio_cfg = {
        "arch": "tdnn",
        "tdnn": {
            "input_dim": 24,
            "hidden_dim": [64, 64, 128] if args.smoke
            else [512, 512, 512, 512, 1500],
            "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]] if args.smoke
            else [[-2, -1, 0, 1, 2], [-2, 0, 2], [-3, 0, 3], [0], [0]],
            "tdnn_layers": 3 if args.smoke else 5,
            "embedding_dim": 32 if args.smoke else 512,
            "pooling": "statistic", "attention_hidden_size": 16,
            "bn_first": True,
        },
    }
    cfg = {
        "data": {"frames": [30, 40],
                 "python_data_config": {
                     "rate": rate, "feat_type": "mfcc",
                     "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                              "energy": True, "normalize": True,
                              "delta": False, "win_len": 0.025,
                              "win_shift": 0.01}}},
        "model": {"audio_config": audio_cfg, "video_config": {"arch": "tcn",
                                                              "tcn": video_cfg}},
        "train": {"optimizer": "sgd", "bs": 4, "lr_decay_step": [4, 8],
                  "lr_decay": 0.1, "epoch": 1, "loss": "CrossEntropy",
                  "n_spk": 1,  # serving: criterion never runs, any >0 works
                  "max_clips": 2, "clip_frames": clip_shape[0],
                  "sgd": {"init_lr": 0.5, "weight_decay": 1e-5,
                          "momentum": 0.9},
                  "resume": "None", "audio_config": {"resume": "None"},
                  "video_config": {"resume": "None"}},
        "test": {"use_cos": True},
    }
    cfg_path = os.path.join(tmp, "fusion.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    v = AVSpeakerVerifier(cfg_path, exp_root=os.path.join(tmp, "exp"),
                          log_time="bench")

    def item(seed):
        r = np.random.default_rng(seed)
        wav = (0.1 * r.standard_normal(rate)).astype(np.float32)
        clips = [r.integers(0, 255, clip_shape).astype(np.uint8)
                 for _ in range(2)]
        return (wav, clips)

    v.enroll("warm", item(0))  # compile audio + video paths
    v.enroll("bob", item(1))
    v.threshold = 0.0

    rows = []
    times = _timed_calls(lambda i=[0]: (i.__setitem__(0, i[0] + 1),
                                        v.enroll(f"a{i[0]}", item(i[0])))[-1],
                         n_calls)
    rows.append(_row("av_enroll_pair", times, 2))
    # audio + video embed dispatches; scoring is host-side (r4)
    times = _timed_calls(lambda: v.verify("bob", item(5)), n_calls)
    rows.append(_row("av_verify_pair", times, 2))
    return rows


if __name__ == "__main__":
    main()
