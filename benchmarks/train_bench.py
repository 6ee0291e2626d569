"""Training-step throughput: E-TDNN LMCL examples/sec/chip.

Measures the full jitted train step (on-device MFCC + forward + backward +
SGD update) on the flagship E-TDNN with the reference recipe shapes
(batch 256, 300-frame crops). Prints one JSON line.
"""

import json
import sys
import time

import numpy as np

BATCH = 256
N_FRAMES = 300
N_SPK = 1211  # VoxCeleb1-style class count
N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import AUDIO_DATA_OPTS, ETDNN_MODEL_OPTS
    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import data_sharding, make_mesh
    from deeplip_tpu.ops.framing import samples_for_frames
    from deeplip_tpu.train.audio import AudioTrainer

    cfg = Config(
        {
            "data": {"frames": [N_FRAMES, N_FRAMES],
                     "python_data_config": AUDIO_DATA_OPTS},
            "model": ETDNN_MODEL_OPTS,
            "train": {
                "type": "sgd", "bs": BATCH, "lr_decay": 0.1,
                "lr_decay_step": [15, 25], "epoch": 30, "loss": "LMCL",
                "scale": 30, "margin": [0.2, 0.2],
                "compute_dtype": "bf16",  # the recommended training recipe
                "sgd": {"init_lr": 0.01, "weight_decay": 1e-5, "momentum": 0.9},
            },
            "test": {},
        }
    )
    mesh = make_mesh()
    trainer = AudioTrainer(cfg, mesh=mesh, n_spk=N_SPK)
    state = trainer.ensure_state()

    samples = samples_for_frames(N_FRAMES, 0.025, 0.01, 16000)
    rng = np.random.default_rng(0)
    pcm = jax.device_put(
        rng.standard_normal((BATCH, samples)).astype(np.float32),
        data_sharding(mesh, 2),
    )
    labels = jax.device_put(
        rng.integers(0, N_SPK, BATCH).astype(np.int64), data_sharding(mesh, 1)
    )
    margin = jnp.float32(0.2)

    from benchmarks._timing import force_fetch

    state, metrics = trainer._train_step(state, pcm, labels, margin)  # compile
    _ = float(metrics["loss"])  # absorb D2H stall

    from deeplip_tpu.train.flops import compiled_flops, mfu_fields

    # unbound jit wrapper: .lower needs the static `self` passed explicitly
    step_flops = compiled_flops(
        type(trainer)._train_step, trainer, state, pcm, labels, margin
    )

    # chained steps (state feeds forward), timed to a forcing fetch — see
    # benchmarks/_timing.py for why block_until_ready is not enough here
    force_fetch(state.params)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        state, metrics = trainer._train_step(state, pcm, labels, margin)
    force_fetch(state.params)
    elapsed = time.perf_counter() - t0

    ex_per_sec = BATCH * N_ITERS / elapsed
    record = {
        "metric": "train_examples_per_sec",
        "value": round(ex_per_sec, 1),
        "unit": "examples/sec",
        "ms_per_step": round(elapsed / N_ITERS * 1000, 2),
        "batch": BATCH,
        "n_frames": N_FRAMES,
    }
    record.update(mfu_fields(step_flops, N_ITERS / elapsed))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
