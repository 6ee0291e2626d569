"""Per-component attribution of the extraction sweep (VERDICT r3 #2).

The headline bench (bench.py, LOMGRID profile) runs `embed_pcm` — int16
rescale → MFCC DSP → masked CMVN → 10 E-TDNN blocks → pooling/FC →
L2-norm — at 21-22% MFU ≈ 66% of the 3-pass-'high' precision ceiling.
The residual ~34% was attributed by argument ("small-matmul DFT
efficiency + XLA conv scheduling", BENCH.md r3); this harness measures it
the way `video_attribution.py` did for the video step: each component
timed fwd-only with the loop INSIDE one jit (`lax.fori_loop`, iterations
chained through a value-preserving data dependency, two-length fit — the
only honest recipe on this rig, see benchmarks/_timing.py).

Components (batch x 3 s utterances, T=298 MFCC frames, 'high' precision —
the exact headline workload):

  rescale        int16 -> f32/32768
  preemph_frame  pre-emphasis + frame gather (B,S) -> (B,T,400)
  dft            |rDFT|^2: two (T,400)@(400,257) basis matmuls + square
  mel_log_dct    mel matmul + log + DCT + lifter + energy substitution
  dsp            full extract_features (cross-check vs the 3 parts)
  cmvn           masked per-utterance CMVN
  tdnn_0..9      each E-TDNN block at its true (B, T_in, C_in) shape
  tdnn_stack     all 10 blocks composed
  pool_fc        masked stats pooling + fc1/bn/act/fc2 + L2-norm
  model          extract_embedding from features (cross-check)
  full           embed_pcm end to end (cross-check vs headline per-batch ms)
  scoring        20k-trial gather+dot on the (3541, 512) embedding matrix

Run on the TPU:
  python benchmarks/extract_attribution.py [batch] [component,...]
"""

import json
import sys
import time
from functools import partial

import numpy as np

UTT_SECONDS = 3.0
RATE = 16000
N_SHORT = 2
N_LONG = 10
N_UTTS = 3541
N_TRIALS = 20000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    import dataclasses

    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
    from deeplip_tpu.models.tdnn import SpeakerEmbNet, TDNNBlock, context_to_kernel
    from deeplip_tpu.ops import features as F
    from deeplip_tpu.ops import framing
    from deeplip_tpu.ops.framing import num_frames
    from deeplip_tpu.train.audio import masked_cmvn

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    results = {}

    feat_cfg = F.FeatureConfig.from_config(AUDIO_DATA_OPTS)
    raw_cfg = dataclasses.replace(feat_cfg, normalize=False, precision="high")
    model = SpeakerEmbNet.from_config(ETDNN_MODEL_OPTS)

    n_samples = int(UTT_SECONDS * RATE)
    t_frames = num_frames(n_samples, feat_cfg.frame_len, feat_cfg.frame_step)
    rng = np.random.default_rng(0)
    lengths = jnp.full((batch,), t_frames, jnp.int32)

    def two_length(loop, *args):
        def run(iters):
            np.asarray(jax.device_get(loop(*args, iters=iters)))
            t0 = time.perf_counter()
            np.asarray(jax.device_get(loop(*args, iters=iters)))
            return time.perf_counter() - t0

        t_short, t_long = run(N_SHORT), run(N_LONG)
        return (t_long - t_short) / (N_LONG - N_SHORT) * 1000

    def bench_fwd(name, fn, x, group=None):
        """fwd-only: per-iteration input perturbed by the carried acc (so no
        iteration's work is loop-invariant or elidable), 'high' precision.

        The chained scalar is ``sum(y)`` — a single-element ``y[0]`` tap
        measured ~0 ms on several components: XLA pushes the slice back
        through elementwise/BN/conv ops and computes only the sliced
        window, eliding the measured work. The full-output reduction makes
        every element live (its own cost is one HBM read of y, ≤0.1 ms at
        these shapes)."""
        if only and name not in only and group not in only:
            return

        @partial(jax.jit, static_argnames="iters")
        def loop(xx, iters):
            def body(_, acc):
                if jnp.issubdtype(xx.dtype, jnp.integer):
                    xv = xx + acc.astype(xx.dtype)  # runtime-0 (acc ~ 1e-38)
                else:
                    xv = xx + (acc * 1e-38).astype(xx.dtype)
                with jax.default_matmul_precision("high"):
                    y = fn(xv)
                return acc + jnp.sum(y).astype(jnp.float32) * 1e-38

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        ms = two_length(loop, x)
        if abs(ms) < 0.8:
            # sub-noise at the 8-iteration delta (relay end-fetch jitter is
            # a few ms): refit over a 80-iteration delta
            global N_SHORT, N_LONG
            ns, nl = N_SHORT, N_LONG
            N_SHORT, N_LONG = 2, 82
            ms = two_length(loop, x)
            N_SHORT, N_LONG = ns, nl
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)

    pcm_i16 = jax.device_put(
        np.clip(rng.standard_normal((batch, n_samples)) * 0.1 * 32768,
                -32768, 32767).astype(np.int16))
    pcm = jax.device_put(
        (np.asarray(pcm_i16).astype(np.float32)) / 32768.0)

    # --- DSP pieces -------------------------------------------------------
    bench_fwd("rescale", lambda x: x.astype(jnp.float32) / 32768.0, pcm_i16,
              group="dsp")

    def preemph_frame(x):
        emph = framing.preemphasis(x, raw_cfg.preemph)
        return framing.frame_signal(emph, raw_cfg.frame_len, raw_cfg.frame_step)

    bench_fwd("preemph_frame", preemph_frame, pcm, group="dsp")

    frames = jax.device_put(np.asarray(
        jax.jit(preemph_frame)(pcm)))

    def dft_sq(fr):
        re, im = F._rdft(fr, raw_cfg.frame_len, raw_cfg)
        return (re * re + im * im) / raw_cfg.n_fft

    bench_fwd("dft", dft_sq, frames, group="dsp")

    pspec = jax.device_put(np.asarray(jax.jit(dft_sq)(frames)))

    def mel_log_dct(ps):
        import deeplip_tpu.ops.spectral as spectral
        from deeplip_tpu.ops.precision import comp_matmul

        energy = jnp.sum(ps, axis=-1)
        energy = jnp.where(energy == 0, F._PSF_EPS, energy)
        fb = jnp.asarray(spectral.mel_filterbank(
            raw_cfg.num_bin, raw_cfg.n_fft, raw_cfg.rate,
            raw_cfg.low_freq, raw_cfg.high_freq), ps.dtype)
        feat = comp_matmul(ps, fb, raw_cfg.precision)
        feat = jnp.where(feat == 0, F._PSF_EPS, feat)
        logm = jnp.log(feat)
        dct = jnp.asarray(spectral.dct_matrix(
            raw_cfg.num_cep, raw_cfg.num_bin), logm.dtype)
        cep = comp_matmul(logm, dct, raw_cfg.precision)
        lift = jnp.asarray(spectral.cepstral_lifter(
            raw_cfg.num_cep, raw_cfg.ceplifter), cep.dtype)
        cep = cep * lift
        return cep.at[..., 0].set(jnp.log(energy))

    bench_fwd("mel_log_dct", mel_log_dct, pspec, group="dsp")
    bench_fwd("dsp", lambda x: F.extract_features(x, raw_cfg), pcm,
              group="dsp")
    bench_fwd("cmvn", lambda f: masked_cmvn(f, lengths), jax.device_put(
        np.asarray(jax.jit(lambda x: F.extract_features(x, raw_cfg))(pcm))),
        group="dsp")

    feats = jax.device_put(np.asarray(jax.jit(
        lambda x: masked_cmvn(F.extract_features(x, raw_cfg), lengths))(pcm)))

    # --- per-block TDNN at true shapes -------------------------------------
    # VALID convs shrink T: track the running T per block
    t_in = t_frames
    c_in = 24
    for i, (ctx, width) in enumerate(zip(model.contexts, model.hidden_dims)):
        name = f"tdnn_{i}"
        k, d = context_to_kernel(ctx)
        if not only or name in only or "tdnn" in (only or set()):
            blk = TDNNBlock(width, tuple(ctx), model.bn_first)
            xs = jax.device_put(
                rng.standard_normal((batch, t_in, c_in)).astype(np.float32))
            variables = blk.init(jax.random.PRNGKey(i), xs[:2])

            def blk_fn(x, blk=blk, variables=variables):
                return blk.apply(variables, x, train=False)

            bench_fwd(name, blk_fn, xs, group="tdnn")
        t_in -= (k - 1) * d
        c_in = width

    def tdnn_stack(f):
        x = f
        for blk_mod in _stack_blocks:
            x = blk_mod[0].apply(blk_mod[1], x, train=False)
        return x

    if not only or {"tdnn_stack", "tdnn"} & (only or set()):
        _stack_blocks = []
        t_in, c_in = t_frames, 24
        for i, (ctx, width) in enumerate(zip(model.contexts, model.hidden_dims)):
            blk = TDNNBlock(width, tuple(ctx), model.bn_first)
            xs0 = jnp.zeros((2, t_in, c_in), jnp.float32)
            _stack_blocks.append((blk, blk.init(jax.random.PRNGKey(i), xs0)))
            k, d = context_to_kernel(ctx)
            t_in -= (k - 1) * d
            c_in = width
        bench_fwd("tdnn_stack", tdnn_stack, feats, group="tdnn")

    # --- pooling + FC head, full model, full path --------------------------
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t_frames, 24), jnp.float32))

    def pool_fc(x):
        # run extract_embedding on a pre-conv 1500-wide tensor is not
        # directly exposed; measure (model - tdnn_stack) via the full model
        # instead and report pool_fc as the residue cross-check below. Here:
        # the pooled head alone at its true input shape.
        from deeplip_tpu.models.pooling import MeanStdPooling

        pooled = MeanStdPooling().apply({}, x, lengths=model.valid_lengths(lengths))
        w1 = jnp.asarray(rng.standard_normal((3000, 512)), jnp.float32) * 0.01
        w2 = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32) * 0.01
        h = pooled @ w1
        h = jnp.maximum(h, 0.2 * h)
        xv = h @ w2
        return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

    t_out = t_frames - (model.receptive_field - 1)
    x1500 = jax.device_put(
        rng.standard_normal((batch, t_out, 1500)).astype(np.float32))
    bench_fwd("pool_fc", pool_fc, x1500, group="model")

    def model_fn(f):
        xv, _ = model.apply(variables, f, lengths=lengths,
                            method=model.extract_embedding)
        return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

    bench_fwd("model", model_fn, feats, group="model")

    def full_fn(x):
        f = F.extract_features(x.astype(jnp.float32) / 32768.0, raw_cfg)
        f = masked_cmvn(f, lengths)
        xv, _ = model.apply(variables, f, lengths=lengths,
                            method=model.extract_embedding)
        return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

    bench_fwd("full", full_fn, pcm_i16, group="model")

    # --- sweep composition: the headline's lax.map over the stacked corpus
    # vs an UNROLLED per-batch python loop in one jit (XLA can pipeline and
    # schedule batches independently; lax.map is a sequential while-loop).
    # `full`×n_batches undershoots the measured sweep by ~25%, so the
    # composition itself is a candidate cost — measure it directly.
    if not only or {"sweep_map", "sweep_unrolled"} & (only or set()):
        # 14 batches at the headline bs=256; capped so small-batch smoke
        # runs stay tractable (the slice below shrinks the corpus to match)
        n_batches = min(-(-N_UTTS // batch), 16)
        m_utts = min(N_UTTS, n_batches * batch)
        keys = jax.random.split(jax.random.PRNGKey(3), n_batches)

        @jax.jit
        def synth(keys):
            def one(key):
                p = 0.1 * jax.random.normal(key, (batch, n_samples), jnp.float32)
                return jnp.clip(p * 32768.0, -32768, 32767).astype(jnp.int16)

            return jax.lax.map(one, keys)

        stack = synth(keys)
        pairs = jax.device_put(
            rng.integers(0, m_utts, (N_TRIALS, 2)).astype(np.int32))

        def embed_i16(x):
            with jax.default_matmul_precision("high"):
                f = F.extract_features(x.astype(jnp.float32) / 32768.0, raw_cfg)
                f = masked_cmvn(f, lengths)
                xv, _ = model.apply(variables, f, lengths=lengths,
                                    method=model.extract_embedding)
                return xv / jnp.linalg.norm(xv, -1, keepdims=True).clip(1e-12)

        def score_of(embs, eps):
            e = embs.reshape(-1, embs.shape[-1])[:m_utts]
            a = jnp.take(e, pairs[:, 0], axis=0)
            b = jnp.take(e, pairs[:, 1], axis=0)
            return jnp.sum(a * b, axis=-1) + eps * 1e-38

        def sweep_variants(name, sweep_fn):
            @partial(jax.jit, static_argnames="iters")
            def loop(st, iters):
                def body(_, acc):
                    return jnp.sum(sweep_fn(st, acc)) * 1e-38 + acc

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

            def run(iters):
                np.asarray(jax.device_get(loop(stack, iters=iters)))
                t0 = time.perf_counter()
                np.asarray(jax.device_get(loop(stack, iters=iters)))
                return time.perf_counter() - t0

            t1, t3 = run(1), run(3)
            ms = (t3 - t1) / 2 * 1000
            results[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms/sweep "
                  f"({ms / n_batches:.2f} ms/batch)", flush=True)

        def sweep_map_fn(st, eps):
            def one(p):
                return embed_i16(p + (eps * 1e-38).astype(jnp.int16))

            return score_of(jax.lax.map(one, st), eps)

        def sweep_unrolled_fn(st, eps):
            embs = jnp.concatenate(
                [embed_i16(st[i] + (eps * 1e-38).astype(jnp.int16))
                 for i in range(n_batches)])
            return score_of(embs, eps)

        sweep_variants("sweep_map", sweep_map_fn)
        sweep_variants("sweep_unrolled", sweep_unrolled_fn)

    # --- trial scoring ------------------------------------------------------
    if not only or "scoring" in only:
        embs = jax.device_put(
            rng.standard_normal((N_UTTS, 512)).astype(np.float32))
        pairs = jax.device_put(
            rng.integers(0, N_UTTS, (N_TRIALS, 2)).astype(np.int32))

        def score_fn(e):
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)
            a = jnp.take(e, pairs[:, 0], axis=0)
            b = jnp.take(e, pairs[:, 1], axis=0)
            return jnp.sum(a * b, axis=-1)

        bench_fwd("scoring", score_fn, embs)

    print(json.dumps({"batch": batch, "precision": "high", **results}),
          flush=True)


if __name__ == "__main__":
    main()
