"""A/B probe: the Lipreading frontend Conv3D (64x(5,7,7)/stride(1,2,2)/pad
(2,3,3), C_in=1) lowered directly vs via spatial space-to-depth.

The direct form maps terribly onto the MXU (attribution r3: the frontend
runs at ~10% MFU, 36 of the 124 ms step): the contraction dim is a
1-channel 7x7 window and the stride-2 output decimates the systolic
array's reuse. Space-to-depth folds the 2x2 spatial phases into channels —
``(B,T,88,88,1) -> (B,T,44,44,4)`` — turning it into a stride-1 conv with
kernel (5,4,4) over 4 channels (the classic TPU conv0 trick, cf. the
public MLPerf ResNet space-to-depth recipe). The kernel is re-scattered at
trace time from the SAME (5,7,7,1,64) parameter, so checkpoints/imports
are unchanged; 15 of 64 phase slots are structural zeros (1.31x FLOP
overhead, traded for MXU alignment).

Run on the TPU: ``python benchmarks/conv3d_probe.py [batch]``.
"""

import json
import sys
import time
from functools import partial

import numpy as np

T = 29
N_SHORT = 2
N_LONG = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.ops.video import frontend_conv3d_s2d

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, T, 88, 88, 1)), dtype)
    kernel = jnp.asarray(
        rng.standard_normal((5, 7, 7, 1, 64)) * 0.05, jnp.float32)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def direct(k, xx):
        # bf16 in/out like the model's nn.Conv(dtype=bf16); MXU accumulates
        # f32 internally either way
        return jax.lax.conv_general_dilated(
            xx, k.astype(xx.dtype), window_strides=(1, 2, 2),
            padding=[(2, 2), (3, 3), (3, 3)], dimension_numbers=dn)

    # --- numerics: s2d must reproduce the direct conv
    y_direct = np.asarray(jax.jit(direct)(kernel, x), np.float32)
    y_s2d = np.asarray(jax.jit(frontend_conv3d_s2d)(kernel, x), np.float32)
    err = float(np.max(np.abs(y_direct - y_s2d)))
    ref = float(np.max(np.abs(y_direct)))
    print(f"shapes {y_direct.shape} vs {y_s2d.shape}; "
          f"max abs diff {err:.3e} (ref magnitude {ref:.3e})", flush=True)
    assert y_direct.shape == y_s2d.shape
    # bf16 operands, f32 accumulation; only summation order differs
    assert err <= 2e-2 * ref, (err, ref)

    def two_length(loop):
        def run(iters):
            out = loop(kernel, x, iters=iters)
            np.asarray(jax.device_get(out))
            t0 = time.perf_counter()
            np.asarray(jax.device_get(loop(kernel, x, iters=iters)))
            return time.perf_counter() - t0

        t_short, t_long = run(N_SHORT), run(N_LONG)
        return (t_long - t_short) / (N_LONG - N_SHORT) * 1000

    def make_loop(conv):
        def loss(k, xx):
            return jnp.sum(conv(k, xx).astype(jnp.float32) ** 2) * 1e-9

        @partial(jax.jit, static_argnames="iters")
        def loop(k, xx, iters):
            def body(_, k):
                return k - 1e-9 * jax.grad(loss)(k, xx)

            k = jax.lax.fori_loop(0, iters, body, k)
            return jnp.sum(k)

        return loop

    ms_direct = two_length(make_loop(direct))
    print(f"direct fwd+bwd: {ms_direct:.2f} ms", flush=True)
    ms_s2d = two_length(make_loop(frontend_conv3d_s2d))
    print(f"s2d    fwd+bwd: {ms_s2d:.2f} ms", flush=True)

    flops = batch * T * 44 * 44 * 64 * (5 * 7 * 7) * 2 * 3  # fwd+dgrad+wgrad
    print(json.dumps({
        "batch": batch, "ms_direct": round(ms_direct, 2),
        "ms_s2d": round(ms_s2d, 2),
        "speedup": round(ms_direct / ms_s2d, 2),
        "mfu_direct": round(flops / (ms_direct * 1e-3) / 197e12, 3),
        "mfu_s2d": round(flops / (ms_s2d * 1e-3) / 197e12, 3),
        "max_abs_diff_vs_direct": err,
    }), flush=True)


if __name__ == "__main__":
    main()
