"""Video training MFU probe: step time + XLA-counted FLOPs across batch
sizes and dtypes, to locate the throughput/MFU sweet spot (VERDICT r1 #3).

Run on the TPU: ``python benchmarks/video_mfu_probe.py``.
"""

import json
import sys
import time

import numpy as np

T = 29
SIZE = 96
N_ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import data_sharding, make_mesh
    from deeplip_tpu.train.flops import compiled_flops, mfu_fields
    from deeplip_tpu.train.video import VideoTrainer

    cfg = Config(
        {
            "backbone_type": "resnet",
            "relu_type": "prelu",
            "tcn_kernel_size": [3, 5, 7],
            "tcn_num_layers": 4,
            "tcn_dropout": 0.2,
            "tcn_dwpw": False,
            "tcn_width_mult": 1,
            "width_mult": 1.0,
        }
    )
    mesh = make_mesh()
    rng = np.random.default_rng(0)

    batches = tuple(
        int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2 else
                         ("32", "64", "128"))
    )
    for dtype in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["bf16"]):
        for batch in batches:
            trainer = VideoTrainer(cfg, num_classes=500, mesh=mesh,
                                   compute_dtype=dtype)
            state = trainer.ensure_state()
            clips = jax.device_put(
                rng.integers(0, 255, (batch, T, SIZE, SIZE)).astype(np.uint8),
                data_sharding(mesh, 4),
            )
            lengths = jax.device_put(
                np.full((batch,), T, np.int32), data_sharding(mesh, 1)
            )
            labels = jax.device_put(
                rng.integers(0, 500, batch).astype(np.int64),
                data_sharding(mesh, 1),
            )
            key = jax.random.PRNGKey(1)

            from benchmarks._timing import force_fetch

            state, metrics = trainer._train_step(state, clips, lengths, labels, key)
            _ = float(metrics["loss"])

            # chained steps timed to a forcing fetch (benchmarks/_timing.py)
            force_fetch(state.params)
            t0 = time.perf_counter()
            for _ in range(N_ITERS):
                state, metrics = trainer._train_step(
                    state, clips, lengths, labels, key
                )
            force_fetch(state.params)
            elapsed = time.perf_counter() - t0

            flops = compiled_flops(
                type(trainer)._train_step, trainer, state, clips, lengths,
                labels, key,
            )
            rec = {
                "dtype": dtype,
                "batch": batch,
                "clips_per_sec": round(batch * N_ITERS / elapsed, 1),
                "ms_per_step": round(elapsed / N_ITERS * 1000, 2),
            }
            rec.update(mfu_fields(flops, N_ITERS / elapsed))
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
