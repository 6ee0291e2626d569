"""Conv layout probe: per-frame small-spatial convs vs frame-packed layouts.

The lipreading trunk folds T into batch and runs 3x3 convs on tiny spatial
grids (22x22 -> 11 -> 6 -> 3). On TPU, spatial extents below the (8, 128)
vector-tile granularity waste sublanes in the deep layers. Packing the T
frames of a clip along one spatial axis (with zero separator columns that
reproduce SAME-conv zero padding exactly) restores tile occupancy:

  per-frame: (B*T, S, S, C)      packed: (B, S, T*(S+sep), C)

Measurement: the iteration loop runs INSIDE one jit (lax.fori_loop with the
conv input chained through the carry) so the rig's relay sees a single
execution with a scalar output — the only fully trustworthy shape for
microbenchmarks here (benchmarks/_timing.py). Per-loop fixed cost is
removed with a two-length fit.

Run on the TPU: ``python benchmarks/conv_shapes_probe.py``.
"""

import json
import sys
import time

import numpy as np

B = 64
T = 29
N_SHORT = 10
N_LONG = 50

STAGES = ((22, 64), (11, 128), (6, 256), (3, 512))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")

    key = jax.random.PRNGKey(0)

    def time_conv(x0, w):
        from functools import partial

        @partial(jax.jit, static_argnames="iters")
        def loop(x0, iters):
            def body(_, carry):
                x, acc = carry
                y = jax.lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                s = jnp.sum(y)
                # subnormal feedback: value-preserving chain through x
                return (x0 + s.astype(x0.dtype) * jnp.asarray(1e-30, x0.dtype),
                        acc + s)
            _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0)))
            return acc

        def run(iters):
            s = loop(x0, iters)  # compile (cached per iters)
            np.asarray(s)
            t0 = time.perf_counter()
            np.asarray(loop(x0, iters))
            return time.perf_counter() - t0

        t_short, t_long = run(N_SHORT), run(N_LONG)
        return (t_long - t_short) / (N_LONG - N_SHORT) * 1000

    for s, c in STAGES:
        w = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
        flops = B * T * s * s * c * c * 9 * 2

        x_pf = jax.random.normal(key, (B * T, s, s, c), jnp.bfloat16)
        ms_pf = time_conv(x_pf, w)

        sep = 2  # zero separator columns between packed frames
        x_pk = jax.random.normal(key, (B, s, T * (s + sep), c), jnp.bfloat16)
        ms_pk = time_conv(x_pk, w)
        flops_pk = B * s * (T * (s + sep)) * c * c * 9 * 2

        print(json.dumps({
            "stage": f"{s}x{s}x{c}",
            "per_frame_ms": round(ms_pf, 3),
            "per_frame_tflops": round(flops / ms_pf / 1e9, 1),
            "packed_ms": round(ms_pk, 3),
            "packed_tflops": round(flops_pk / ms_pk / 1e9, 1),
            "speedup_at_equal_work": round(ms_pf / (ms_pk * flops / flops_pk), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
