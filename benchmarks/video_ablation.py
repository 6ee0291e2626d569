"""Ablation timing of the video train step: measure the full donated
trainer step (the only reliably-timeable unit on this rig — see
benchmarks/_timing.py) with one feature removed at a time. The delta vs
baseline prices each feature IN CONTEXT, which isolated stage timing
cannot do here (non-donated outputs are shipped eagerly by the relay).

Run on the TPU: ``python benchmarks/video_ablation.py [batch] [abl1,abl2,..]``.
"""

import json
import sys
import time

import numpy as np

T = 29
SIZE = 96
N_ITERS = 30

ABLATIONS = (
    "baseline",        # bf16, dropout 0.2, prelu, maxpool, random crop+flip
    "no_dropout",      # tcn_dropout = 0
    "relu",            # relu_type = relu (no PReLU params)
    "eval_transform",  # center crop, no flip (no per-clip RNG)
    "avgpool",         # frontend avg_pool instead of max_pool
    "no_tcn",          # classifier straight on mean frame features
    "rbg_rng",         # threefry -> rbg PRNG for dropout/transform bits
)


def run_one(ablation: str, batch: int):
    import jax

    if ablation == "rbg_rng":
        jax.config.update("jax_default_prng_impl", "rbg")

    import flax.linen as nn
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from benchmarks._timing import force_fetch
    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import data_sharding, make_mesh
    from deeplip_tpu.ops import video as V
    from deeplip_tpu.train.video import VideoTrainer

    orig_nn = None
    if ablation == "avgpool":
        # patch the frontend pool (benchmark-only surgery)
        import deeplip_tpu.models.lipreading as L

        orig_nn = L.nn
        patched = type(L.nn)("nn_patched")
        patched.__dict__.update(nn.__dict__)
        patched.max_pool = lambda x, window_shape, strides, padding: nn.avg_pool(
            x, window_shape, strides=strides, padding=padding)
        L.nn = patched

    if ablation == "eval_transform":
        orig_tt = V.train_transform
        V.train_transform = lambda clips, key, size: V.eval_transform(clips, size)

    cfg = Config(
        {
            "backbone_type": "resnet",
            "relu_type": "relu" if ablation == "relu" else "prelu",
            "tcn_kernel_size": [3, 5, 7],
            "tcn_num_layers": 0 if ablation == "no_tcn" else 4,
            "tcn_dropout": 0.0 if ablation in ("no_dropout", "no_tcn") else 0.2,
            "tcn_dwpw": False,
            "tcn_width_mult": 1,
            "width_mult": 1.0,
        }
    )
    mesh = make_mesh()
    trainer = VideoTrainer(cfg, num_classes=500, mesh=mesh, compute_dtype="bf16")
    state = trainer.ensure_state()

    rng = np.random.default_rng(0)
    clips = jax.device_put(
        rng.integers(0, 255, (batch, T, SIZE, SIZE)).astype(np.uint8),
        data_sharding(mesh, 4),
    )
    lengths = jax.device_put(np.full((batch,), T, np.int32), data_sharding(mesh, 1))
    labels = jax.device_put(
        rng.integers(0, 500, batch).astype(np.int64), data_sharding(mesh, 1))
    key = jax.random.PRNGKey(1)

    state, metrics = trainer._train_step(state, clips, lengths, labels, key)
    _ = float(metrics["loss"])
    force_fetch(state.params)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        state, metrics = trainer._train_step(state, clips, lengths, labels, key)
    force_fetch(state.params)
    elapsed = time.perf_counter() - t0

    if ablation == "eval_transform":
        V.train_transform = orig_tt
    if ablation == "rbg_rng":
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    if orig_nn is not None:
        import deeplip_tpu.models.lipreading as L

        L.nn = orig_nn

    print(json.dumps({
        "ablation": ablation,
        "batch": batch,
        "ms_per_step": round(elapsed / N_ITERS * 1000, 2),
        "clips_per_sec": round(batch * N_ITERS / elapsed, 1),
    }), flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(ABLATIONS)
    for name in names:
        run_one(name, batch)


if __name__ == "__main__":
    main()
