"""Per-op matmul-precision budget for the extraction sweep (VERDICT r2 #1).

The sweep's parity-grade settings (DSP basis matmuls at 'highest' = 6 MXU
passes, every TDNN conv + FC at 'high' = 3 passes) over-provision precision
~30x against the 1e-4 embedding bar. This script measures, on the TPU:

1. SENSITIVITY — embedding error when ONE op class drops to 'default'
   (1 bf16 pass) while everything else stays 'highest': which ops actually
   consume the error budget;
2. PLANS — full per-op assignments (dsp / per-conv / fc modes, including
   the 2-pass weight-compensated 'wsplit2' of ``ops.precision``):
   embedding error vs all-'highest' AND honest chained-fetch timing.

Output: one JSON line per row. Run: ``python benchmarks/precision_budget.py``
(optionally ``BUDGET_BATCH=256 BUDGET_ITERS=30``).

``BUDGET_TRAINED=1`` measures in the regime the parity bar actually gates:
a briefly-trained torch reference net (imported weights + BN stats) on real
synthetic-corpus speech. The r3 random-init run UNDERSTATED errors ~5.6x —
trained nets on speech-like audio have temporally-correlated activations,
so their bf16 rounding noise does NOT average out in statistics pooling
(random-init + white-noise PCM decorrelates frame-to-frame). Plans must be
selected on trained-weight numbers.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BUDGET_BATCH", 256))
SECONDS = 3.0
RATE = 16000
N_ITERS = int(os.environ.get("BUDGET_ITERS", 30))


def _trained_setup(jax, jnp, base_model, t_frames, n_samples):
    """--full-style trained weights + real corpus audio (the regime the
    parity bar gates): synthesize a GRID-layout corpus, briefly train the
    TORCH reference net on it (scripts/parity_check.py machinery), import
    weights+BN stats, and batch real utterances crop/padded to 3 s."""
    import tempfile

    import torch

    sys.path.insert(0, "/root/repo/scripts")
    from parity_check import ARCHS, build_torch_net, train_torch_net
    from benchmarks.reference_cpu_baseline import numpy_mfcc
    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.data.manifest import SpeakerManifest
    from deeplip_tpu.data.synthetic import make_audio_corpus
    from deeplip_tpu.interop.torch_import import import_speaker_embnet_state_dict

    work = tempfile.mkdtemp(prefix="budget_")
    make_audio_corpus(work, n_spk=20, utts_per_spk=20, duration=1.5)
    manifest = SpeakerManifest.load(os.path.join(work, "manifest.csv"))
    arch = ARCHS["etdnn"]
    tnet = build_torch_net(torch, arch["context"],
                           [24] + arch["hidden_dim"], 512)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    feats, labels = {}, {}
    for s, u in manifest.all_utterances():
        name = "/".join(u.path.split(os.sep)[-2:])
        y, _ = read_wav(u.path)
        feats[name] = numpy_mfcc(y.astype(np.float64)).astype(np.float32)
        labels[name] = s
    train_torch_net(torch, tnet, feats, labels, 512, n_spk=20, steps=60)
    params, stats = import_speaker_embnet_state_dict(
        tnet.state_dict(), n_blocks=len(arch["context"]))
    # device_put: the importer yields host numpy arrays — passing those to
    # jit re-ships the full model through the ~40 MB/s relay every call,
    # which swamped the r3 trained-regime timings (535 ms/batch vs 14)
    variables = jax.device_put({"params": params, "batch_stats": stats})

    wavs = [u for _, u in manifest.all_utterances()][:BATCH]
    pcm = np.zeros((BATCH, n_samples), np.float32)
    for i, u in enumerate(wavs):
        y, _ = read_wav(u.path)
        # tile short utterances to fill 3 s (keeps speech statistics)
        reps = int(np.ceil(n_samples / len(y)))
        pcm[i] = np.tile(y, reps)[:n_samples]
    return variables, jnp.asarray(pcm)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
    from benchmarks._timing import force_fetch
    from deeplip_tpu.models.tdnn import SpeakerEmbNet
    from deeplip_tpu.ops import features as F
    from deeplip_tpu.ops.framing import num_frames

    base_feat = F.FeatureConfig.from_config(AUDIO_DATA_OPTS)
    base_model = SpeakerEmbNet.from_config(ETDNN_MODEL_OPTS)
    n_blocks = len(base_model.contexts)
    n_samples = int(SECONDS * RATE)
    t_frames = num_frames(n_samples, base_feat.frame_len, base_feat.frame_step)
    rng = np.random.default_rng(0)
    if os.environ.get("BUDGET_TRAINED"):
        variables, pcm = _trained_setup(jax, jnp, base_model, t_frames,
                                        n_samples)
    else:
        variables = base_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, t_frames, 24), jnp.float32))
        # randomized BN stats (fresh zeros/ones understate BN's effect)
        stats = dict(variables["batch_stats"])

        def perturb(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict) or hasattr(v, "items"):
                    out[k] = perturb(dict(v))
                elif k == "mean":
                    out[k] = jnp.asarray(
                        rng.normal(0, 0.3, np.shape(v)), jnp.float32)
                elif k == "var":
                    out[k] = jnp.asarray(
                        rng.uniform(0.5, 2.0, np.shape(v)), jnp.float32)
                else:
                    out[k] = v
            return out

        variables = {"params": variables["params"],
                     "batch_stats": perturb(stats)}
        pcm = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (BATCH, n_samples), jnp.float32)

    def make_embed(dsp, conv, fc):
        """conv: str | tuple-of-str per block. dsp='fft' routes the rDFT
        through jnp.fft.rfft (native f32, no bf16-pass tax) with the tiny
        mel/DCT matmuls staying at 'high'."""
        if dsp == "fft":
            feat_cfg = dataclasses.replace(base_feat, precision="high",
                                           dft="fft")
        elif dsp == "fused":
            # r3c: one [cos|-sin] basis matmul at 'high' with the re²+im²
            # fold riding the row-stacked mel matmul (ops.features
            # _fused_rdft_sq) — 640 vs 768 padded lanes of DFT work
            feat_cfg = dataclasses.replace(base_feat, precision="high",
                                           dft="matmul_fused")
        else:
            feat_cfg = dataclasses.replace(base_feat, precision=dsp)
        model = base_model.clone(conv_precision=conv, fc_precision=fc)

        @jax.jit
        def embed(variables, pcm):
            feats = F.extract_features(pcm, feat_cfg)
            xv, _ = model.apply(variables, feats,
                                method=model.extract_embedding)
            return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

        @jax.jit
        def embed_sum(variables, pcm, eps):
            feats = F.extract_features(pcm + eps * 1e-38, feat_cfg)
            xv, _ = model.apply(variables, feats,
                                method=model.extract_embedding)
            return jnp.sum(xv)

        return embed, embed_sum

    ref = np.asarray(make_embed("highest", "highest", "highest")[0](
        variables, pcm))

    def run(tag, dsp, conv, fc, timeit=True):
        embed, embed_sum = make_embed(dsp, conv, fc)
        err = float(np.max(np.abs(np.asarray(embed(variables, pcm)) - ref)))
        row = {"row": tag, "dsp": dsp,
               "conv": conv if isinstance(conv, str) else "|".join(
                   c or "-" for c in conv),
               "fc": fc, "batch": BATCH,
               "max_abs_err_vs_highest": err}
        if timeit:
            s = embed_sum(variables, pcm, jnp.float32(0))
            force_fetch(s)
            t0 = time.perf_counter()
            for _ in range(N_ITERS):
                s = embed_sum(variables, pcm, s)
            force_fetch(s)
            ms = (time.perf_counter() - t0) / N_ITERS * 1000
            row["ms_per_batch"] = round(ms, 2)
            row["utts_per_sec"] = round(BATCH / ms * 1000, 1)
        print(json.dumps(row), flush=True)
        return row

    H = "highest"
    # --- sensitivity: one class at 'default', rest 'highest' (no timing:
    # the question is error attribution, not speed)
    run("sens:dsp", "default", H, H, timeit=False)
    run("sens:fc", H, H, "default", timeit=False)
    for i in range(n_blocks):
        conv = tuple(H if j != i else "default" for j in range(n_blocks))
        run(f"sens:conv{i}", H, conv, H, timeit=False)

    # --- split-mode residual error per class ('ws' compensates the weight
    # operand, 'as' the activations — r3 finding: activations dominate)
    run("sens:dsp_ws", "wsplit2", H, H, timeit=False)
    run("sens:dsp_as", "asplit2", H, H, timeit=False)
    conv_ws = ("wsplit2",) * n_blocks
    conv_as = ("asplit2",) * n_blocks
    run("sens:allconv_ws", H, conv_ws, H, timeit=False)
    run("sens:allconv_as", H, conv_as, H, timeit=False)
    run("sens:allconv_def", H, "default", H, timeit=False)

    # --- rFFT rDFT (r3b): algorithmic replacement for the DFT basis
    # matmuls — native f32 arithmetic (no bf16-pass tax) at ~45x fewer FLOPs
    run("sens:dsp_fft", "fft", H, H, timeit=False)

    # --- candidate full plans (error + honest timing)
    run("plan:current", H, "high", "high")            # r2 production setting
    run("plan:all_high", "high", "high", "high")
    run("plan:fft_high", "fft", "high", "high")
    run("plan:fused_high", "fused", "high", "high")   # r3c fused-basis rDFT
    run("plan:all_default", "default", "default", "default")
    run("plan:dspws_convdef", "wsplit2", "default", "high")
    run("plan:dsphigh_convas", "high", conv_as, "high")
    run("plan:dspas_convas", "asplit2", conv_as, "high")
    run("plan:dsphigh_convmix", "high",
        tuple("default" if i < 4 else "asplit2" for i in range(n_blocks)),
        "high")


if __name__ == "__main__":
    main()
