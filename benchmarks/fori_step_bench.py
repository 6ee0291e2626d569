"""Pure-device training-step time: K full train steps inside ONE jit
(lax.fori_loop over the real trainer step), removing every per-dispatch
relay cost of this rig (benchmarks/_timing.py). This is the number a
normal PCIe-attached TPU host would see from the per-step dispatch loop.

Run on the TPU:
  python benchmarks/fori_step_bench.py video [batch]
  python benchmarks/fori_step_bench.py audio [batch]
"""

import json
import sys
import time
from functools import partial

import numpy as np

T = 29
SIZE = 96
N_SHORT = 4
N_LONG = 24


def measure(loop, state):
    import jax

    def run(iters):
        out = loop(state, iters)
        np.asarray(jax.device_get(out))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(state, iters)))
        return time.perf_counter() - t0

    t_short, t_long = run(N_SHORT), run(N_LONG)
    return (t_long - t_short) / (N_LONG - N_SHORT) * 1000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import data_sharding, make_mesh
    from deeplip_tpu.train.flops import mfu_fields

    kind = sys.argv[1] if len(sys.argv) > 1 else "video"
    mesh = make_mesh()
    rng = np.random.default_rng(0)

    if kind == "video":
        from deeplip_tpu.train.video import VideoTrainer

        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        cfg = Config(
            {"backbone_type": "resnet", "relu_type": "prelu",
             "tcn_kernel_size": [3, 5, 7], "tcn_num_layers": 4,
             "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_width_mult": 1,
             "width_mult": 1.0})
        trainer = VideoTrainer(cfg, num_classes=500, mesh=mesh,
                               compute_dtype="bf16")
        state = trainer.ensure_state()
        clips = jax.device_put(
            rng.integers(0, 255, (batch, T, SIZE, SIZE)).astype(np.uint8),
            data_sharding(mesh, 4))
        lengths = jax.device_put(np.full((batch,), T, np.int32),
                                 data_sharding(mesh, 1))
        labels = jax.device_put(rng.integers(0, 500, batch).astype(np.int64),
                                data_sharding(mesh, 1))

        @partial(jax.jit, static_argnames="iters")
        def loop(state, iters):
            def body(_, carry):
                state, key = carry
                key, sub = jax.random.split(key)
                state, _metrics = trainer._train_step(
                    state, clips, lengths, labels, sub)
                return (state, key)
            state, _ = jax.lax.fori_loop(
                0, iters, body, (state, jax.random.PRNGKey(1)))
            # return a PARAM-dependent scalar: returning state.step alone
            # lets XLA dead-code-eliminate the whole training computation
            leaves = jax.tree_util.tree_leaves(state.params)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        from deeplip_tpu.ops import video as V

        @partial(jax.jit, static_argnames="iters")
        def loop_fwd(state, iters):
            # forward-only (transform + model + loss), chained via a
            # value-preserving eps into the transform output
            def body(i, carry):
                key, acc = carry
                key, kt, kd = jax.random.split(key, 3)
                x = V.train_transform(clips, kt, (88, 88))[..., None]
                x = x + acc * 1e-38
                logits, _ = trainer.train_model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    x, lengths=lengths, train=True, mutable=["batch_stats"],
                    rngs={"dropout": kd})
                from deeplip_tpu.losses.softmax import softmax_cross_entropy

                return (key, acc + softmax_cross_entropy(logits, labels))
            _, acc = jax.lax.fori_loop(
                0, iters, body, (jax.random.PRNGKey(1), jnp.float32(0)))
            return acc

        from deeplip_tpu.train.flops import compiled_flops

        step_flops = compiled_flops(
            type(trainer)._train_step, trainer, state, clips, lengths, labels,
            jax.random.PRNGKey(1))
        ms = measure(loop, state)
        ms_fwd = measure(loop_fwd, state)
        rec = {"kind": "video", "batch": batch,
               "ms_per_step_device": round(ms, 2),
               "ms_fwd_only_device": round(ms_fwd, 2),
               "clips_per_sec_device": round(batch / ms * 1000, 1)}
        rec.update(mfu_fields(step_flops, 1000.0 / ms))
        print(json.dumps(rec), flush=True)

    elif kind == "fusion":
        from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
        from deeplip_tpu.ops.framing import samples_for_frames
        from deeplip_tpu.train.flops import compiled_flops
        from deeplip_tpu.train.fusion import FusionTrainer

        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 60  # reference bs
        groups = 2
        vcfg = Config(
            {"backbone_type": "resnet", "relu_type": "prelu",
             "tcn_kernel_size": [3, 5, 7], "tcn_num_layers": 4,
             "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_width_mult": 1,
             "width_mult": 1.0})
        trainer = FusionTrainer(
            Config(ETDNN_MODEL_OPTS), vcfg, n_spk=57,
            audio_data_opts=Config(AUDIO_DATA_OPTS), mesh=mesh,
            compute_dtype="bf16")
        state = trainer.ensure_state()
        samples = samples_for_frames(300, 0.025, 0.01, 16000)
        pcm = jax.device_put(
            rng.standard_normal((batch, samples)).astype(np.float32),
            data_sharding(mesh, 2))
        clips = jax.device_put(
            rng.integers(0, 255, (batch, groups, T, SIZE, SIZE)).astype(np.uint8),
            data_sharding(mesh, 5))
        clip_lengths = jax.device_put(
            np.full((batch, groups), T, np.int32), data_sharding(mesh, 2))
        group_sizes = jax.device_put(
            np.full((batch,), groups, np.int32), data_sharding(mesh, 1))
        labels = jax.device_put(rng.integers(0, 57, batch).astype(np.int64),
                                data_sharding(mesh, 1))

        @partial(jax.jit, static_argnames="iters")
        def loop(state, iters):
            def body(_, state):
                state, _metrics = trainer._train_step(
                    state, pcm, clips, clip_lengths, group_sizes, labels)
                return state
            state = jax.lax.fori_loop(0, iters, body, state)
            leaves = jax.tree_util.tree_leaves(state.params)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        step_flops = compiled_flops(
            type(trainer)._train_step, trainer, state, pcm, clips,
            clip_lengths, group_sizes, labels)
        ms = measure(loop, state)
        rec = {"kind": "fusion", "batch": batch, "clip_groups": groups,
               "ms_per_step_device": round(ms, 2),
               "pairs_per_sec_device": round(batch / ms * 1000, 1)}
        rec.update(mfu_fields(step_flops, 1000.0 / ms))
        print(json.dumps(rec), flush=True)

    else:
        from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
        from deeplip_tpu.ops.framing import samples_for_frames
        from deeplip_tpu.train.audio import AudioTrainer
        from deeplip_tpu.train.flops import compiled_flops

        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        n_frames = 300
        cfg = Config(
            {"data": {"frames": [n_frames, n_frames],
                      "python_data_config": AUDIO_DATA_OPTS},
             "model": ETDNN_MODEL_OPTS,
             "train": {"type": "sgd", "bs": batch, "lr_decay": 0.1,
                       "lr_decay_step": [15, 25], "epoch": 30, "loss": "LMCL",
                       "scale": 30, "margin": [0.2, 0.2],
                       "compute_dtype": "bf16",
                       "sgd": {"init_lr": 0.01, "weight_decay": 1e-5,
                               "momentum": 0.9}},
             "test": {}})
        trainer = AudioTrainer(cfg, mesh=mesh, n_spk=1211)
        state = trainer.ensure_state()
        samples = samples_for_frames(n_frames, 0.025, 0.01, 16000)
        pcm = jax.device_put(
            rng.standard_normal((batch, samples)).astype(np.float32),
            data_sharding(mesh, 2))
        labels = jax.device_put(rng.integers(0, 1211, batch).astype(np.int64),
                                data_sharding(mesh, 1))
        margin = jnp.float32(0.2)

        @partial(jax.jit, static_argnames="iters")
        def loop(state, iters):
            def body(_, state):
                state, _metrics = trainer._train_step(state, pcm, labels, margin)
                return state
            state = jax.lax.fori_loop(0, iters, body, state)
            leaves = jax.tree_util.tree_leaves(state.params)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        step_flops = compiled_flops(
            type(trainer)._train_step, trainer, state, pcm, labels, margin)
        ms = measure(loop, state)
        rec = {"kind": "audio", "batch": batch,
               "ms_per_step_device": round(ms, 2),
               "examples_per_sec_device": round(batch / ms * 1000, 1)}
        rec.update(mfu_fields(step_flops, 1000.0 / ms))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
