"""End-to-end verification-sweep benchmark on the TPU (driver contract).

Workload: the LOMGRID trial profile from BASELINE.md — 3,541 unique
utterances of 3 s each through the flagship E-TDNN system (MFCC-24 on
device → x-vector extraction → L2-norm), then 20,000 trial cosines scored
as one batched gather+dot: exactly the deeplip_tpu production path.

The synthetic PCM corpus is generated on device and pre-staged as a PCM16
stack OUTSIDE the timed region (r3: the r2 bench ran the threefry RNG
inside the timed sweep, charging ~17% of it to work the production path
never performs); the timed sweep starts from int16 PCM exactly as a wav
decode delivers it, including the int16→f32 rescale. Production overlaps
wav IO with compute via ThreadedPrefetcher, and this rig's host↔device
relay has multi-second first-transfer stalls that would otherwise dominate
the measurement — the hostio profile below measures the IO-inclusive path.
Only the final 20k scores leave the device.

``BENCH_PROFILE=hostio`` measures the production path INCLUDING host I/O:
a real PCM16 wav corpus is synthesized to tmpfs, decoded through
``native.read_wav_batch`` (C++ threaded decoder) under a
``ThreadedPrefetcher``, shipped host→device with double buffering, and
embedded batch-by-batch overlapped with the decode — i.e. nothing is
pre-staged on device. Same metric, extra ``"profile": "hostio"`` field.

Timing methodology (r2, tightened r4): this rig's remote-tunnel runtime
returns from ``block_until_ready`` before execution finishes, so the bench
chains K sweeps through a value-preserving data dependency and times to a
real device->host fetch of the final scores — the only operation that
provably waits (calibration: ``benchmarks/timing_calibration.py``; harness
notes: ``benchmarks/_timing.py``). r4 moved the K-sweep chain INSIDE one
device program (``lax.fori_loop``) with a two-length fit (K=2 vs K=10):
the r3 recipe dispatched each chained sweep separately, and attribution
(``benchmarks/extract_attribution.py``) measured ~61 ms/sweep of that to
be this rig's per-dispatch relay round-trip, not device work. The r3-style
dispatch-chained rate is still reported as
``dispatch_chained_trials_per_sec`` for continuity. On a normal PCIe TPU
host both recipes are simply correct synchronous measurements that agree
to ~1 ms.

Prints ONE JSON line:
  {"metric": "verification_trials_per_sec", "value": ..., "unit":
   "trials/sec", "vs_baseline": ..., "tflops_per_sec": ..., "mfu": ...}

``tflops_per_sec``/``mfu`` come from XLA's cost analysis of the compiled
sweep (deeplip_tpu.train.flops) against the chip's dense bf16 peak.

``vs_baseline`` divides by the reference-equivalent CPU PyTorch pipeline
measured on this host by ``benchmarks/reference_cpu_baseline.py``
(per-utterance batch-1 extraction + per-trial sklearn scoring loop):
165.8 trials/sec (measured 2026-08-16; re-run that script to refresh).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

# per-profile CPU baselines from benchmarks/reference_cpu_baseline.py
# (0.0316 s/utt extraction + 0.43 ms/trial scoring, extrapolated per sweep)
# BENCH_PROFILE=grid sweeps the GRID-scale workload (25,834 unique utts)
# BENCH_PROFILE=ragged drives the SHIPPING bucketed extractor
# (EvalUtteranceSet -> AudioTrainer.extract_embeddings) over a ragged
# 1-3 s wav corpus on tmpfs — IO, bucketing, pad waste, per-batch
# dispatch, masked CMVN/pooling and scoring all included.
_PROFILE = os.environ.get("BENCH_PROFILE", "lomgrid")
REFERENCE_CPU_TRIALS_PER_SEC = 24.2 if _PROFILE == "grid" else 165.8
# torch Lipreading-equivalent per-clip batch-1 extraction on this host
# (benchmarks/reference_cpu_baseline.py --av, measured 2026-08-20:
# 0.0105 s/frame at T=50; re-run that script to refresh)
CPU_SEC_PER_VIDEO_FRAME = 0.0105
N_UNIQUE_UTTS = 25834 if _PROFILE == "grid" else 3541
N_TRIALS = 20000
UTT_SECONDS = 3.0
RATE = 16000
BATCH = int(os.environ.get("BENCH_BATCH", 256))
_SMOKE = bool(os.environ.get("BENCH_SMOKE"))
if _SMOKE:  # tiny CI smoke of the driver contract
    N_UNIQUE_UTTS, N_TRIALS, UTT_SECONDS, BATCH = 48, 96, 0.5, 16


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat driver runs skip recompilation
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, "/root/repo")

    if _PROFILE in ("ragged", "av"):
        from deeplip_tpu.train.flops import mfu_fields

        sweep_fn = _av_sweep if _PROFILE == "av" else _ragged_sweep
        trials_per_sec, flops, extras = sweep_fn(jax, jnp)
        record = {
            "metric": "verification_trials_per_sec",
            "value": round(trials_per_sec, 1),
            "unit": "trials/sec",
            "vs_baseline": round(trials_per_sec / extras.pop("cpu_tps"), 2),
            "profile": _PROFILE,
        }
        record.update(mfu_fields(flops, trials_per_sec / N_TRIALS))
        record.update(extras)
        print(json.dumps(record))
        return

    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
    from deeplip_tpu.models.tdnn import SpeakerEmbNet
    from deeplip_tpu.ops import features as F
    from deeplip_tpu.ops.framing import num_frames
    from deeplip_tpu.train.audio import masked_cmvn

    feat_cfg = F.FeatureConfig.from_config(AUDIO_DATA_OPTS)
    # Per-op precision plan (benchmarks/precision_budget.py, r3,
    # docs/precision_budget_r03.md): in the trained-weight regime the 1e-4
    # parity bar pins EVERY matmul class to >= 'high' (3-pass bf16) — DSP
    # at 1 pass costs 7.4e-4, the FC head 3.0e-4, the convs jointly
    # 1.6e-4, and 2-pass compensated splits recover only ~1.5x. 'high'
    # everywhere measures 2.56e-5 vs 'highest' and holds full parity
    # (scripts/parity_check.py --full --precision tuned). The r2 sweep ran
    # the DSP at 'highest' (6 passes) for no measured accuracy gain;
    # BENCH_PRECISION=r2 restores that for comparison.
    _plan = os.environ.get("BENCH_PRECISION", "high")
    raw_cfg = dataclasses.replace(
        feat_cfg, normalize=False,
        precision="highest" if _plan == "r2" else _plan)
    if os.environ.get("BENCH_DFT"):  # rDFT impl A/B (matmul|matmul_packed|…)
        raw_cfg = dataclasses.replace(raw_cfg, dft=os.environ["BENCH_DFT"])
    model = SpeakerEmbNet.from_config(ETDNN_MODEL_OPTS)

    n_samples = int(UTT_SECONDS * RATE)
    t_frames = num_frames(n_samples, feat_cfg.frame_len, feat_cfg.frame_step)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t_frames, 24), jnp.float32)
    )
    # HOST-resident on purpose (np, not jnp): embed_pcm closes over this, so
    # jit embeds it as an MLIR constant at trace time. A DEVICE-resident
    # closure there forces a device->host fetch inside tracing
    # (_array_mlir_constant_handler) through this rig's flaky tunnel — the
    # r4 driver's attempt-1 death (BENCH_r04.json tail; VERDICT r4 weak #3).
    # Every other device array is a traced argument.
    lengths = np.full((BATCH,), t_frames, np.int32)

    def embed_pcm(variables, pcm):
        # 'high' matmul precision: the parity-grade extraction path (bf16
        # default would be ~8e-4 off the reference embeddings)
        with jax.default_matmul_precision("high"):
            feats = F.extract_features(pcm, raw_cfg)
            feats = masked_cmvn(feats, lengths)
            xv, _ = model.apply(
                variables, feats, lengths=lengths, method=model.extract_embedding
            )
            return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

    def sweep_math(variables, pcm_i16, pairs, eps):
        # the whole extraction sweep + scoring in ONE device program:
        # lax.map sequences the batches on device, removing per-batch host
        # dispatch latency (material through this rig's stdio relay).
        #
        # ``pcm_i16`` is the full utterance stack pre-staged on device as
        # PCM16 — exactly what a wav decode delivers (the hostio profile
        # measures the decode+transfer cost; r2 instead synthesized PCM
        # with a per-batch threefry RNG *inside* the timed sweep, which
        # charged ~17% of the sweep to work the production path never does).
        # The int16→f32 rescale stays in the timed path: production pays it.
        #
        # ``eps`` is (1,) f32 carried from the previous sweep's scores: a
        # STRUCTURAL dependency that chains repeated sweeps so none can be
        # elided by the remote runtime (see benchmarks/_timing.py — on this
        # rig block_until_ready does not wait for remote execution, so the
        # bench must chain K sweeps and force a fetch). Its contribution
        # (score * 1e-38, subnormal) vanishes in the f32 addition, so every
        # sweep computes bit-identical scores.
        def embed_batch(pcm):
            pcm = pcm.astype(jnp.float32) / 32768.0 + eps[0] * 1e-38
            return embed_pcm(variables, pcm)

        embs = jax.lax.map(embed_batch, pcm_i16)
        e = embs.reshape(-1, embs.shape[-1])[:N_UNIQUE_UTTS]
        a = jnp.take(e, pairs[:, 0], axis=0)
        b = jnp.take(e, pairs[:, 1], axis=0)
        return jnp.sum(a * b, axis=-1)

    sweep = jax.jit(sweep_math)

    from functools import partial

    @partial(jax.jit, static_argnames="k")
    def chained_sweeps(variables, pcm_i16, pairs, scores0, k):
        # K chained sweeps INSIDE ONE device program: each sweep's eps is
        # carried from the previous sweep's scores, so none can be elided,
        # and the program pays ONE relay dispatch instead of K. r4
        # attribution (benchmarks/extract_attribution.py sweep_map) measured
        # the r3 recipe — K host-dispatched sweeps chained through device
        # arrays — at 231 ms/sweep vs 170 ms for the identical sweep inside
        # one program: ~61 ms/sweep was this rig's per-dispatch relay
        # round-trip (the same RTT benchmarks/serve_bench.py measures),
        # not device work. The two-length fit below (K=2 vs K=10) removes
        # the remaining constant dispatch+fetch cost exactly like
        # benchmarks/fori_step_bench.py.
        def body(_, scores):
            return sweep_math(variables, pcm_i16, pairs, scores[:1])

        return jax.lax.fori_loop(0, k, body, scores0)

    n_batches = -(-N_UNIQUE_UTTS // BATCH)

    @jax.jit
    def synth_pcm(keys):
        # device-side corpus synthesis (NOT timed): same statistics the r2
        # bench used, materialized once as the PCM16 stack a decoded wav
        # corpus would occupy (~331 MB at the lomgrid profile)
        def one(key):
            pcm = 0.1 * jax.random.normal(key, (BATCH, n_samples), jnp.float32)
            return jnp.clip(pcm * 32768.0, -32768, 32767).astype(jnp.int16)

        return jax.lax.map(one, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), n_batches)
    rng = np.random.default_rng(0)
    pairs = jnp.asarray(rng.integers(0, N_UNIQUE_UTTS, (N_TRIALS, 2)), jnp.int32)

    from deeplip_tpu.train.flops import compiled_flops, mfu_fields

    extras = {}
    if _PROFILE == "hostio":
        trials_per_sec, flops, extras = _hostio_sweep(
            jax, jnp, embed_pcm, variables, pairs, n_batches, n_samples
        )
        elapsed = N_TRIALS / trials_per_sec
    else:
        # warm-up: compile both chain lengths and absorb the relay's
        # first-transfer stall
        pcm_i16 = synth_pcm(keys)
        zeps = jnp.zeros((1,), jnp.float32)
        scores0 = sweep(variables, pcm_i16, pairs, zeps)
        _ = np.asarray(scores0[:8])
        k_short, k_long = (1, 3) if os.environ.get("BENCH_SMOKE") else (2, 10)
        _ = np.asarray(
            chained_sweeps(variables, pcm_i16, pairs, scores0, k_short)[:8])
        _ = np.asarray(
            chained_sweeps(variables, pcm_i16, pairs, scores0, k_long)[:8])

        # timed: two chain lengths inside one program each, fetch-forced;
        # the fit isolates the per-sweep device rate (see chained_sweeps)
        def run(k):
            t0 = time.perf_counter()
            s = np.asarray(chained_sweeps(variables, pcm_i16, pairs, scores0, k))
            dt = time.perf_counter() - t0
            assert s.shape == (N_TRIALS,) and np.all(np.isfinite(s))
            return dt

        t_short, t_long = run(k_short), run(k_long)
        elapsed = (t_long - t_short) / (k_long - k_short)
        trials_per_sec = N_TRIALS / elapsed

        # secondary: the r3 recipe (K host-dispatched chained sweeps, the
        # final fetch waiting on all) — the delta vs the headline is this
        # rig's per-dispatch relay cost, reported for continuity
        k_disp = 2 if os.environ.get("BENCH_SMOKE") else 8
        scores = scores0
        t0 = time.perf_counter()
        for _ in range(k_disp):
            scores = sweep(variables, pcm_i16, pairs, scores[:1])
        _ = np.asarray(scores)
        extras["dispatch_chained_trials_per_sec"] = round(
            N_TRIALS / ((time.perf_counter() - t0) / k_disp), 1)

        # XLA's cost analysis counts the lax.map (while-loop) body ONCE, so
        # count the per-batch embedding separately and scale by n_batches
        # (done after timing: lower/compile keeps the tunnel busy otherwise)
        per_batch = compiled_flops(
            jax.jit(embed_pcm), variables,
            jnp.zeros((BATCH, n_samples), jnp.float32),
        )
        flops = per_batch * n_batches if per_batch else None

    record = {
        "metric": "verification_trials_per_sec",
        "value": round(trials_per_sec, 1),
        "unit": "trials/sec",
        "vs_baseline": round(trials_per_sec / REFERENCE_CPU_TRIALS_PER_SEC, 2),
    }
    record.update(mfu_fields(flops, 1.0 / elapsed))
    record.update(extras)
    if _PROFILE != "lomgrid":
        record["profile"] = _PROFILE
    print(json.dumps(record))


def _ragged_sweep(jax, jnp):
    """The SHIPPING extractor on a ragged corpus (VERDICT r3 #1).

    Unlike the headline (bench-local uniform-length ``embed_pcm``), this
    drives ``AudioTrainer.extract_embeddings`` over an ``EvalUtteranceSet``
    — the bucketed, masked production path the CLI/serve surfaces use
    (``train/audio.py:extract_embeddings``; reference analogue: the
    variable-length eval loaders at
    ``/root/reference/models/audio_models/datasets.py:273-334``) — end to
    end from PCM16 wavs on tmpfs: header scan, bucketing, threaded decode,
    int16 H2D transport, per-bucket-shape compiles (warmed), per-batch
    dispatch+fetch, masked CMVN/pooling, then the 20k-trial gather+dot
    scoring and EER. Utterance lengths are uniform 1-3 s (GRID/LOMGRID-like
    ragged corpus). Reports pad-waste (padded frames / total padded frames)
    and the number of distinct compiled batch shapes.

    The warm pass (untimed) compiles every bucket shape and absorbs this
    rig's relay first-transfer stall, exactly like the other profiles; the
    timed pass re-runs the full pipeline including all host IO.

    ``cpu_tps`` in the returned extras is the reference-equivalent CPU
    baseline extrapolated to this corpus: the measured 0.0316 s/utt batch-1
    extraction at 3.0 s scales linearly with duration (MFCC + TDNN convs
    are linear in T; batch-1 fixed overhead makes this an *under*estimate
    of CPU cost, i.e. conservative for vs_baseline) + 0.43 ms/trial
    scoring (benchmarks/reference_cpu_baseline.py).
    """
    import shutil
    import tempfile

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.data.audio_io import write_wav
    from deeplip_tpu.data.audio_pipeline import EvalUtterance, EvalUtteranceSet
    from deeplip_tpu.eval.scoring import TrialList, cosine_eer
    from deeplip_tpu.ops.framing import frame_len_step, num_frames
    from deeplip_tpu.train.audio import AudioTrainer
    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS

    bucket_frames = 20 if _SMOKE else 100
    cfg = Config({
        "data": {"frames": [200, 400], "python_data_config": AUDIO_DATA_OPTS},
        "model": ETDNN_MODEL_OPTS,
        "train": {
            "type": "sgd", "bs": BATCH, "lr_decay": 0.1,
            "lr_decay_step": [15, 25], "epoch": 1, "loss": "LMCL",
            "scale": 30, "margin": [0.2, 0.2],
            "sgd": {"init_lr": 0.01, "weight_decay": 1e-5, "momentum": 0.9},
        },
        # the production extraction config — deliberately all-default knobs
        # (r5: the benched configuration IS the shipped configuration):
        # transport resolves to int16 via 'auto' (PCM16 corpus at the native
        # rate — value-exact, half the H2D bytes) and n_buckets defaults to
        # 8 adaptive DP-optimal edges (eval_set_kwargs)
        "test": {"batch_size": BATCH, "bucket_frames": bucket_frames,
                 "matmul_precision": "high"},
    })

    rng = np.random.default_rng(11)
    lo, hi = (0.3, 0.7) if _SMOKE else (1.0, 3.0)
    durations = rng.uniform(lo, hi, N_UNIQUE_UTTS)
    mean_dur = float(durations.mean())
    cpu_tps = N_TRIALS / (
        N_UNIQUE_UTTS * 0.0316 * mean_dur / 3.0 + N_TRIALS * 0.00043)

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus = tempfile.mkdtemp(prefix="deeplip_bench_ragged_", dir=tmp_root)
    try:
        # --- corpus synthesis (not timed: the reference reads existing wavs)
        base = rng.standard_normal(int(hi * RATE)).astype(np.float32) * 0.1
        utts = []
        for i, dur in enumerate(durations):
            pcm = np.roll(base, i * 131)[: int(dur * RATE)] * (
                0.5 + (i % 7) / 7.0)
            p = os.path.join(corpus, f"utt{i:06d}.wav")
            write_wav(p, pcm, RATE)
            utts.append(EvalUtterance(f"utt{i:06d}", p))

        labels = rng.integers(0, 2, N_TRIALS).astype(np.int8)
        pair_idx = rng.integers(0, N_UNIQUE_UTTS, (N_TRIALS, 2))
        trials = TrialList(
            labels,
            [utts[i].name for i in pair_idx[:, 0]],
            [utts[j].name for j in pair_idx[:, 1]],
        )

        trainer = AudioTrainer(cfg, n_spk=16)
        trainer.ensure_state()

        # r5: the utterance set is built through eval_set_kwargs — the SAME
        # config→kwargs mapping every shipping surface (CLI / serve / dev
        # sweeps) uses — with the all-default knobs: n_buckets=8 adaptive
        # edges, transport='auto' (resolves to int16 on this PCM16 corpus).
        # BENCH_RAGGED_BUCKETS=0 opts out to fixed bucket_frames
        # quantization (the r4 continuity recipe) via the same config knob
        # a user would set.
        from deeplip_tpu.data.audio_pipeline import eval_set_kwargs

        test_opts = dict(cfg.test)
        if os.environ.get("BENCH_RAGGED_BUCKETS") is not None:
            test_opts["n_buckets"] = int(os.environ["BENCH_RAGGED_BUCKETS"])
        set_kw = eval_set_kwargs(trainer.feat_cfg, test_opts)
        n_buckets = set_kw.get("n_buckets")

        def utt_set():
            return EvalUtteranceSet(utts, num_workers=8, **set_kw)

        from collections import Counter

        fl, fs = frame_len_step(0.025, 0.01, RATE)
        shape_counts = Counter()
        stats = {"pad": 0, "total": 0, "h2d_bytes": 0, "dtype": "int16"}

        class _Tallied:
            """batches() passthrough that tallies pad waste + shapes."""

            def __init__(self, inner):
                self.inner = inner

            def batches(self):
                for b in self.inner.batches():
                    rows, s_max = b["pcm"].shape
                    bucket_t = num_frames(s_max, fl, fs)
                    stats["total"] += rows * bucket_t
                    stats["pad"] += rows * bucket_t - int(b["feat_lengths"].sum())
                    stats["h2d_bytes"] += b["pcm"].nbytes
                    stats["dtype"] = b["pcm"].dtype.name
                    shape_counts[b["pcm"].shape] += 1
                    yield b

        # warm pass: compile every bucket shape, absorb the relay stall
        warm_store = trainer.extract_embeddings(_Tallied(utt_set()))
        _ = cosine_eer(trials, warm_store)
        shape_counts.clear()
        stats.update(pad=0, total=0, h2d_bytes=0)

        # timed pass: the full shipping pipeline, host IO included
        t0 = time.perf_counter()
        store = trainer.extract_embeddings(_Tallied(utt_set()))
        t_extract = time.perf_counter() - t0
        eer, _thr = cosine_eer(trials, store)
        elapsed = time.perf_counter() - t0
        assert len(store) == N_UNIQUE_UTTS and np.isfinite(eer)

        # FLOPs: per-shape cost analysis of the already-jitted embed,
        # weighted by how many batches ran at each shape (untimed)
        flops = _ragged_flops(jnp, trainer, shape_counts)

        extras = {
            "cpu_tps": cpu_tps,
            "eer": round(float(eer), 4),
            "mean_utt_s": round(mean_dur, 3),
            "pad_waste": round(stats["pad"] / max(stats["total"], 1), 4),
            "bucket_mode": (f"adaptive_k{n_buckets}" if n_buckets
                            else f"fixed_{bucket_frames}"),
            "transport": stats["dtype"],  # 'auto' resolution, observed
            "n_batch_shapes": len(shape_counts),
            "extract_s": round(t_extract, 3),
            "score_s": round(elapsed - t_extract, 3),
            "h2d_mb": round(stats["h2d_bytes"] / 1e6, 1),
            "h2d_mb_per_sec": round(stats["h2d_bytes"] / 1e6 / elapsed, 1),
        }
        return N_TRIALS / elapsed, flops, extras
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


def _ragged_flops(jnp, trainer, shape_counts):
    """Sum of XLA cost-analysis FLOPs over the sweep's batch shapes (each
    distinct shape weighted by how many batches ran at it)."""
    from deeplip_tpu.train.flops import compiled_flops

    embed = trainer._embed_fns.get("embed")
    if embed is None:
        return None
    state = trainer.ensure_state()
    total = 0.0
    for (rows, s_max), n in shape_counts.items():
        rows += -rows % trainer.n_devices
        f = compiled_flops(
            embed, state.params, state.batch_stats,
            jnp.zeros((rows, s_max), jnp.int16),  # dtype: FLOPs-identical
            jnp.ones((rows,), jnp.int32), jnp.ones((rows,), jnp.int32),
        )
        if f is None:
            return None
        total += f * n
    return total or None


def _av_sweep(jax, jnp):
    """End-to-end AUDIO-VISUAL protocol throughput (VERDICT r4 #1).

    The system's name-giving workload, measured as one number for the first
    time: a LOMGRID-scale paired corpus (ragged 1-3 s PCM16 wavs + one
    uint8 ROI npz clip per utterance at 25 fps, the ``test_av_scoring_e2e``
    shape at protocol scale) driven through BOTH shipping extractors —
    ``AudioTrainer.extract_embeddings`` (E-TDNN, eval_set_kwargs defaults)
    and ``VideoTrainer.embedding_store`` (full Lipreading ResNet-18
    frame-feature path, per-clip time-mean) — then 20k trials scored by
    score-level fusion AND feature-level fusion (z-norm + concat + cosine),
    the reference's AV test back-ends
    (``/root/reference/train_fusion.py:317-420``,
    ``models/audio_models/utils.py:331-523``; its video leg embeds clips in
    a per-clip batch-1 host loop, ``train_fusion.py:341-349``).

    ``cpu_tps``: the reference-equivalent CPU PyTorch AV sweep extrapolated
    from per-stage measurements on this host
    (``benchmarks/reference_cpu_baseline.py`` + ``--av``): audio 0.0316
    s/utt at 3 s (linear in duration), video ``CPU_SEC_PER_VIDEO_FRAME``
    per frame through the torch Lipreading equivalent batch-1, and
    0.43 ms/trial per scoring loop (two back-ends → 2 loops + the z-norm
    concat, conservatively counted as 2).
    """
    import shutil
    import tempfile

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.data.audio_io import write_wav
    from deeplip_tpu.data.audio_pipeline import (
        EvalUtterance,
        EvalUtteranceSet,
        eval_set_kwargs,
    )
    from deeplip_tpu.data.video_dataset import VideoClip, VideoClipBatches
    from deeplip_tpu.eval.scoring import (
        TrialList,
        feature_fusion_eer,
        score_fusion_eer,
    )
    from deeplip_tpu.train.audio import AudioTrainer
    from deeplip_tpu.train.video import VideoTrainer
    from deeplip_tpu.ops.framing import frame_len_step, num_frames
    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS

    fps = 25
    video_bs = 8 if _SMOKE else int(os.environ.get("BENCH_VIDEO_BATCH", 32))
    bucket_t = 4 if _SMOKE else 5
    cfg = Config({
        "data": {"frames": [200, 400], "python_data_config": AUDIO_DATA_OPTS},
        "model": ETDNN_MODEL_OPTS,
        "train": {
            "type": "sgd", "bs": BATCH, "lr_decay": 0.1,
            "lr_decay_step": [15, 25], "epoch": 1, "loss": "LMCL",
            "scale": 30, "margin": [0.2, 0.2],
            "sgd": {"init_lr": 0.01, "weight_decay": 1e-5, "momentum": 0.9},
        },
        # all-default extraction knobs (adaptive buckets, auto transport)
        "test": {"batch_size": BATCH, "matmul_precision": "high"},
    })

    rng = np.random.default_rng(13)
    lo, hi = (0.3, 0.7) if _SMOKE else (1.0, 3.0)
    durations = rng.uniform(lo, hi, N_UNIQUE_UTTS)
    mean_dur = float(durations.mean())
    t_frames_v = np.maximum((durations * fps).astype(int), 8)
    total_frames = int(t_frames_v.sum())
    cpu_total = (
        N_UNIQUE_UTTS * 0.0316 * mean_dur / 3.0
        + total_frames * CPU_SEC_PER_VIDEO_FRAME
        + 2 * N_TRIALS * 0.00043
    )
    cpu_tps = N_TRIALS / cpu_total

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus = tempfile.mkdtemp(prefix="deeplip_bench_av_", dir=tmp_root)
    try:
        # --- paired corpus synthesis (not timed: the reference reads
        # existing wav + ROI-npz corpora)
        base = rng.standard_normal(int(hi * RATE)).astype(np.float32) * 0.1
        vbase = rng.integers(0, 255, (int(hi * fps) + 8, 96, 96),
                             dtype=np.uint8)
        utts, clips = [], []
        for i, dur in enumerate(durations):
            pcm = np.roll(base, i * 131)[: int(dur * RATE)] * (
                0.5 + (i % 7) / 7.0)
            p = os.path.join(corpus, f"utt{i:06d}.wav")
            write_wav(p, pcm, RATE)
            name = f"utt{i:06d}"
            utts.append(EvalUtterance(name, p))
            vp = os.path.join(corpus, f"utt{i:06d}.npz")
            np.savez(vp, data=np.roll(vbase, i % 32, axis=1)[: t_frames_v[i]])
            clips.append(VideoClip(vp, i % 36, name))

        labels = rng.integers(0, 2, N_TRIALS).astype(np.int8)
        pair_idx = rng.integers(0, N_UNIQUE_UTTS, (N_TRIALS, 2))
        trials = TrialList(
            labels,
            [utts[i].name for i in pair_idx[:, 0]],
            [utts[j].name for j in pair_idx[:, 1]],
        )

        atrainer = AudioTrainer(cfg, n_spk=36)
        atrainer.ensure_state()
        set_kw = eval_set_kwargs(atrainer.feat_cfg, dict(cfg.test))
        vtrainer = VideoTrainer(
            Config({"backbone_type": "resnet", "relu_type": "prelu",
                    "tcn_dropout": 0.2, "tcn_dwpw": False,
                    "tcn_kernel_size": [3, 5, 7], "tcn_num_layers": 4,
                    "tcn_width_mult": 1, "width_mult": 1.0}),
            num_classes=36, crop_size=(88, 88))
        vtrainer.ensure_state()

        fl, fs = frame_len_step(0.025, 0.01, RATE)
        a_shapes, v_shapes = {}, {}
        stats = {"a_pad": 0, "a_total": 0, "v_pad": 0, "v_total": 0,
                 "h2d_bytes": 0}

        class _TalliedAudio:
            def __init__(self, inner):
                self.inner = inner

            def batches(self):
                for b in self.inner.batches():
                    rows, s_max = b["pcm"].shape
                    t = num_frames(s_max, fl, fs)
                    stats["a_total"] += rows * t
                    stats["a_pad"] += rows * t - int(b["feat_lengths"].sum())
                    stats["h2d_bytes"] += b["pcm"].nbytes
                    a_shapes[b["pcm"].shape] = a_shapes.get(b["pcm"].shape, 0) + 1
                    yield b

        class _TalliedVideo:
            def __init__(self, inner):
                self.inner = inner

            def epoch(self, idx=0):
                for b in self.inner.epoch(idx):
                    rows, t = b["clips"].shape[:2]
                    stats["v_total"] += rows * t
                    stats["v_pad"] += rows * t - int(b["lengths"].sum())
                    stats["h2d_bytes"] += b["clips"].nbytes
                    v_shapes[b["clips"].shape] = v_shapes.get(b["clips"].shape, 0) + 1
                    yield b

        def audio_set():
            return _TalliedAudio(EvalUtteranceSet(utts, num_workers=8, **set_kw))

        def video_set():
            # pre_crop: host center-crop to the eval crop size — the device
            # transform's center_crop becomes an identity slice (bit-equal,
            # tested) and the clip H2D drops 16% (96→88)
            return _TalliedVideo(VideoClipBatches(
                clips, batch_size=video_bs, bucket_t=bucket_t, shuffle=False,
                num_workers=8, pre_crop=vtrainer.crop_size))

        def protocol():
            t0 = time.perf_counter()
            astore = atrainer.extract_embeddings(audio_set())
            t_a = time.perf_counter() - t0
            vstore = vtrainer.embedding_store(video_set())
            t_v = time.perf_counter() - t0 - t_a
            eer_sf, _ = score_fusion_eer(trials, astore, vstore)
            eer_ff, _ = feature_fusion_eer(trials, astore, vstore)
            elapsed = time.perf_counter() - t0
            return astore, vstore, eer_sf, eer_ff, t_a, t_v, elapsed

        # warm pass: compile every bucket shape (both modalities), absorb
        # the relay first-transfer stall
        protocol()
        for k in stats:
            stats[k] = 0
        a_shapes.clear()
        v_shapes.clear()

        astore, vstore, eer_sf, eer_ff, t_a, t_v, elapsed = protocol()
        assert len(astore) == N_UNIQUE_UTTS and len(vstore) == N_UNIQUE_UTTS
        assert np.isfinite(eer_sf) and np.isfinite(eer_ff)

        flops_a = _ragged_flops(jnp, atrainer, a_shapes)
        flops_v = _video_flops(jnp, vtrainer, v_shapes)
        flops = (flops_a + flops_v) if (flops_a and flops_v) else None

        extras = {
            "cpu_tps": cpu_tps,
            "eer_score_fusion": round(float(eer_sf), 4),
            "eer_feature_fusion": round(float(eer_ff), 4),
            "mean_utt_s": round(mean_dur, 3),
            "video_frames": total_frames,
            "audio_s": round(t_a, 3),
            "video_s": round(t_v, 3),
            "fuse_s": round(elapsed - t_a - t_v, 3),
            "clips_per_sec": round(N_UNIQUE_UTTS / t_v, 1),
            "pad_waste_audio": round(
                stats["a_pad"] / max(stats["a_total"], 1), 4),
            "pad_waste_video": round(
                stats["v_pad"] / max(stats["v_total"], 1), 4),
            "n_batch_shapes": len(a_shapes) + len(v_shapes),
            "h2d_mb": round(stats["h2d_bytes"] / 1e6, 1),
        }
        return N_TRIALS / elapsed, flops, extras
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


def _video_flops(jnp, vtrainer, shape_counts):
    """XLA cost-analysis FLOPs of the video frame-feature extraction,
    weighted per batch shape (mirrors :func:`_ragged_flops`)."""
    from deeplip_tpu.train.flops import compiled_flops

    state = vtrainer.ensure_state()
    extract = vtrainer._extract_fn()
    total = 0.0
    for shape, n in shape_counts.items():
        f = compiled_flops(
            extract, state.params, state.batch_stats,
            jnp.zeros(shape, jnp.uint8),
            jnp.ones((shape[0],), jnp.int32),
        )
        if f is None:
            return None
        total += f * n
    return total or None


def _hostio_sweep(jax, jnp, embed_pcm, variables, pairs, n_batches,
                  n_samples):
    """End-to-end sweep including host I/O: wav corpus on tmpfs → C++ batch
    decode under ThreadedPrefetcher → double-buffered H2D → per-batch
    embedding → one gather+dot scoring. Returns (trials/sec, flops)."""
    import shutil
    import tempfile

    from deeplip_tpu import native
    from deeplip_tpu.data.audio_io import read_wav, write_wav
    from deeplip_tpu.data.prefetch import ThreadedPrefetcher
    from deeplip_tpu.train.flops import compiled_flops

    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus = tempfile.mkdtemp(prefix="deeplip_bench_wavs_", dir=tmp_root)
    try:
        # --- corpus synthesis (not timed: the reference reads existing wavs)
        rng = np.random.default_rng(7)
        paths = []
        base = rng.standard_normal(n_samples).astype(np.float32) * 0.1
        for i in range(N_UNIQUE_UTTS):
            # cheap per-file variation; decode cost is content-independent
            pcm = np.roll(base, i * 131) * (0.5 + (i % 7) / 7.0)
            p = os.path.join(corpus, f"utt{i:06d}.wav")
            write_wav(p, pcm, RATE)
            paths.append(p)

        batches = [paths[i * BATCH : (i + 1) * BATCH] for i in range(n_batches)]

        use_native = native.available()

        def decode(batch_paths):
            # int16 end-to-end: PCM16 payloads copy straight through and ship
            # host->device at half the bytes; the device rescales to float.
            n = len(batch_paths)
            out = np.zeros((BATCH, n_samples), np.int16)
            if use_native:
                flat, offsets, wrote, _rates = native.read_wav_batch_i16(
                    batch_paths, [0] * n, [n_samples] * n, [n_samples] * n,
                    n_threads=4,
                )
                flat = flat.reshape(n, n_samples)
                w = wrote.astype(np.int64)
                out[:n] = flat  # capacities==n_samples so rows are aligned
                mask = np.arange(n_samples)[None, :] >= w[:, None]
                out[:n][mask] = 0
            else:
                for j, p in enumerate(batch_paths):
                    pcm, _ = read_wav(p, stop=n_samples)
                    out[j, : len(pcm)] = np.clip(
                        pcm * 32768.0, -32768, 32767
                    ).astype(np.int16)
            return out

        # ONE device program for the whole post-transfer sweep: per-batch jit
        # dispatches through this rig's remote-tunnel runtime cost ~0.5 s
        # each, so embedding + scoring run as a single lax.map program over
        # the staged int16 stack (on normal PCIe hosts this also minimizes
        # launch overhead, it just matters less there).
        @jax.jit
        def sweep_i16(variables, pcm_i16_stack, pairs):
            def one(pcm_i16):
                return embed_pcm(
                    variables, pcm_i16.astype(jnp.float32) / 32768.0
                )

            embs = jax.lax.map(one, pcm_i16_stack)
            e = embs.reshape(-1, embs.shape[-1])[:N_UNIQUE_UTTS]
            a = jnp.take(e, pairs[:, 0], axis=0)
            b = jnp.take(e, pairs[:, 1], axis=0)
            return jnp.sum(a * b, axis=-1)

        # warm-up: compile + absorb the relay stall
        warm = jnp.zeros((n_batches, BATCH, n_samples), jnp.int16)
        _ = np.asarray(sweep_i16(variables, warm, pairs)[:8])
        del warm

        t0 = time.perf_counter()
        # decode under the prefetcher while each finished batch ships
        # host->device asynchronously (device_put enqueues immediately)
        staged = [
            jax.device_put(pcm)
            for pcm in ThreadedPrefetcher(batches, decode, num_workers=8,
                                          lookahead=6)
        ]
        scores = sweep_i16(variables, jnp.stack(staged), pairs)
        scores_host = np.asarray(scores)
        elapsed = time.perf_counter() - t0

        per_batch = compiled_flops(
            jax.jit(lambda v, p: embed_pcm(v, p.astype(jnp.float32) / 32768.0)),
            variables, jnp.zeros((BATCH, n_samples), jnp.int16),
        )
        flops = per_batch * n_batches if per_batch else None

        assert scores_host.shape == (N_TRIALS,) and np.all(
            np.isfinite(scores_host)
        )
        h2d_mb = n_batches * BATCH * n_samples * 2 / 1e6
        extras = {"h2d_mb": round(h2d_mb, 1),
                  "h2d_mb_per_sec": round(h2d_mb / elapsed, 1)}
        return N_TRIALS / elapsed, flops, extras
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


def _supervise():
    """Run the measurement in a fresh subprocess, retrying on transient
    TPU-tunnel failures.

    This rig's remote PJRT tunnel occasionally refuses connections or hangs
    at backend init for minutes (observed r3: two back-to-back bench runs
    died at startup, a third succeeded after the tunnel recovered). A failed
    JAX backend init poisons the process-global backend cache, so retry must
    be a NEW process. The supervisor forwards the child's stderr live,
    prints only the final JSON line on success, and bounds each attempt so a
    hung tunnel cannot wedge the driver.
    """
    import subprocess

    def _die_with_parent():
        # PR_SET_PDEATHSIG: if the supervisor is killed (driver timeout,
        # SIGTERM), take the measurement child down too — an orphaned bench
        # would keep the single TPU tunnel busy for up to 2400 s and corrupt
        # whatever runs next (CLAUDE.md: concurrent TPU processes contend)
        try:
            import ctypes
            import signal as _sig

            ctypes.CDLL(None, use_errno=True).prctl(1, _sig.SIGKILL)
        except Exception:
            pass

    delays = (0, 60, 240, 600)  # seconds before each of 4 attempts
    last_out = ""
    for attempt, delay in enumerate(delays, 1):
        if delay:
            print(
                f"bench: retrying in {delay}s (attempt {attempt}/{len(delays)})",
                file=sys.stderr, flush=True)
            time.sleep(delay)
        env = dict(os.environ, DEEPLIP_BENCH_INNER="1")
        try:
            # stderr is inherited (streams live — progress stays visible
            # even if the attempt later times out); only stdout, which
            # carries the JSON line, is captured
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, text=True, timeout=2400,
                preexec_fn=_die_with_parent)
        except subprocess.TimeoutExpired:
            print(f"bench: attempt {attempt} timed out after 2400s",
                  file=sys.stderr, flush=True)
            continue
        last_out = proc.stdout
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{") and '"metric"' in ln), None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(f"bench: attempt {attempt} failed (rc={proc.returncode})",
              file=sys.stderr, flush=True)
    sys.stdout.write(last_out)  # surface whatever the last attempt printed
    return 1


if __name__ == "__main__":
    if os.environ.get("DEEPLIP_BENCH_INNER"):
        main()
    else:
        sys.exit(_supervise())
