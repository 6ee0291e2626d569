"""Video embedder throughput: clips/sec/chip through Lipreading frame features.

BASELINE.md records video clips/sec alongside the primary verification
metric (no reference number exists). Workload: 88x88 gray clips of 29
frames (GRID utterances are ~1 s @ 29 fps) through the full pipeline —
on-device transform + Conv3D frontend + ResNet-18 per-frame trunk — i.e.
the hot path of both video training and fusion extraction.

Measurement: the iteration loop runs INSIDE one jit (lax.fori_loop, scalar
output, value-preserving eps chain) — the only fully trustworthy shape on
this rig's relay (benchmarks/_timing.py); per-loop fixed cost removed with
a two-length fit.

Prints one JSON line with clips/sec and frames/sec.
"""

import json
import sys
import time
from functools import partial

import numpy as np

BATCH = 32
T = 29
SIZE = 96
N_SHORT = 8
N_LONG = 40


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
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

    @partial(jax.jit, static_argnames="iters")
    def loop(variables, iters):
        def body(_, carry):
            key, acc = carry
            key, k2 = jax.random.split(key)
            clips = jax.random.randint(
                k2, (BATCH, T, SIZE, SIZE), 0, 255, jnp.int32
            ).astype(jnp.uint8)
            x = V.eval_transform(clips, (88, 88))[..., None] + acc * 1e-38
            feats = model.apply(variables, x, method=model.frame_features)
            return (key, acc + jnp.sum(feats))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (jax.random.PRNGKey(1), jnp.float32(0)))
        return acc

    def run(iters):
        np.asarray(jax.device_get(loop(variables, iters)))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(variables, iters)))
        return time.perf_counter() - t0

    t_short, t_long = run(N_SHORT), run(N_LONG)
    ms = (t_long - t_short) / (N_LONG - N_SHORT) * 1000

    clips_per_sec = BATCH / ms * 1000
    print(
        json.dumps(
            {
                "metric": "video_clips_per_sec",
                "value": round(clips_per_sec, 1),
                "unit": "clips/sec",
                "frames_per_sec": round(clips_per_sec * T, 1),
                "ms_per_batch": round(ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
