"""Video embedder throughput: clips/sec/chip through Lipreading frame features.

BASELINE.md records video clips/sec alongside the primary verification
metric (no reference number exists). Workload: 88x88 gray clips of 29
frames (GRID utterances are ~1 s @ 29 fps) through the full pipeline —
on-device transform + Conv3D frontend + ResNet-18 per-frame trunk — i.e.
the hot path of both video training and fusion extraction.

Prints one JSON line with clips/sec and frames/sec.
"""

import json
import sys
import time

import numpy as np

BATCH = 32
T = 29
SIZE = 96
N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.models.lipreading import Lipreading
    from deeplip_tpu.ops import video as V

    model = Lipreading.from_config(
        {
            "backbone_type": "resnet",
            "relu_type": "prelu",
            "tcn_kernel_size": [3, 5, 7],
            "tcn_num_layers": 4,
            "tcn_dropout": 0.2,
            "tcn_dwpw": False,
            "tcn_width_mult": 1,
            "width_mult": 1.0,
        },
        num_classes=500,
        extract_feats=True,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 88, 88, 1), jnp.float32)
    )

    @jax.jit
    def embed_sum(variables, key, eps):
        # eps: a scalar carried from the previous batch — a value-preserving
        # structural dependency that chains iterations; the output reduces
        # to ONE scalar inside the jit (large per-iteration outputs are
        # shipped device->host eagerly by this rig's relay and poison the
        # timing — benchmarks/_timing.py)
        clips = jax.random.randint(key, (BATCH, T, SIZE, SIZE), 0, 255, jnp.int32
                                   ).astype(jnp.uint8)
        x = V.eval_transform(clips, (88, 88))[..., None] + eps * 1e-38
        return jnp.sum(model.apply(variables, x, method=model.frame_features))

    sys.path.insert(0, "/root/repo")
    from benchmarks._timing import force_fetch

    keys = jax.random.split(jax.random.PRNGKey(1), N_ITERS)
    s = embed_sum(variables, keys[0], jnp.float32(0))
    _ = np.asarray(s)  # compile + absorb D2H stall

    t0 = time.perf_counter()
    for k in keys:
        s = embed_sum(variables, k, s)
    force_fetch(s)
    elapsed = time.perf_counter() - t0

    clips_per_sec = BATCH * N_ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "video_clips_per_sec",
                "value": round(clips_per_sec, 1),
                "unit": "clips/sec",
                "frames_per_sec": round(clips_per_sec * T, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
