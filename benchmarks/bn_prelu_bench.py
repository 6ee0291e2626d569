"""Pallas fused BN+PReLU vs the XLA composition at the video hot shapes.

The VERDICT r4 #5 measurement: the video-training roofline residual
(BENCH.md r3: ~31.0% MFU at bs 128, remaining ms argued to be XLA
scheduling around 2.2x-tile-padded C=64 NHWC layouts) had one unmeasured
lever left — a hand-written Pallas kernel that fuses the train-mode BN
(single-pass batch stats) and the PReLU, reading each padded tile once
per pass. ``ops/pallas/bn_prelu_kernel.py`` is that kernel (numerics
pinned to the shipped composition by ``tests/test_pallas_bn_prelu.py``);
this bench races fwd+bwd chains of 4 BN+PReLU pairs at the frontend
(B·T,44,44,64) and stage-1 (B·T,22,22,64) shapes in the training dtype
(bf16) and f32, with the honest-timing rules of benchmarks/_timing.py
(loop inside one jit via fori_loop, scalar output depending on every
param, two-length fit, fetch-forced).

Expectation going in (documented so the verdict is honest either way):
the XLA composition is already at the algorithmic traffic minimum
(stats = 1 fused read; apply = 1 read + 1 write), so the kernel can win
only on scheduling/launch overhead — and both sides must move the same
padded HBM tiles (lane 64->128, sublane 44->48).

Run on the TPU: ``python benchmarks/bn_prelu_bench.py [batch]``.
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
    from deeplip_tpu.ops.pallas.bn_prelu_kernel import bn_prelu_train

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    bt = batch * T
    rng = np.random.default_rng(0)
    results = {}

    def two_length(loop, *args):
        def run(iters):
            out = loop(*args, iters=iters)
            np.asarray(jax.device_get(out))
            t0 = time.perf_counter()
            np.asarray(jax.device_get(loop(*args, iters=iters)))
            return time.perf_counter() - t0

        t_short, t_long = run(N_SHORT), run(N_LONG)
        return (t_long - t_short) / (N_LONG - N_SHORT) * 1000

    def bn1_xla(x, scale, bias):
        # the shipped TorchBatchNorm >=4-D train math (single-pass stats)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
        msq = jnp.mean(jnp.square(xf), axis=tuple(range(x.ndim - 1)))
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)

    def prelu(x, a):
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)

    def make_loop(shape, impl, block_rows):
        def pair(x, s, b, a):
            if impl == "xla":
                return prelu(bn1_xla(x, s, b), a)
            if impl == "pallas_flat":
                # 2-D (N, C) refs with big sublane-aligned blocks — Mosaic's
                # reliable regime — at the price of whatever relayout XLA
                # inserts for the reshape around the padded NHWC layout
                x2 = x.reshape(-1, x.shape[-1])
                y, _m, _v = bn_prelu_train(x2, s, b, a, 1e-5, False,
                                           block_rows)
                return y.reshape(x.shape)
            y, _mean, _var = bn_prelu_train(x, s, b, a, 1e-5, False,
                                            block_rows)
            return y

        def loss(p, xx):
            x = xx
            for i in range(4):
                x = pair(x, p[f"s{i}"], p[f"b{i}"], p[f"a{i}"])
            return jnp.sum(x.astype(jnp.float32) ** 2) * 1e-9

        @partial(jax.jit, static_argnames="iters")
        def loop(p, xx, iters):
            def body(_, p):
                g = jax.grad(loss)(p, xx)
                return jax.tree.map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

            p = jax.lax.fori_loop(0, iters, body, p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(p))

        return loop

    for dname, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for tag, shape in (("44x64", (bt, 44, 44, 64)),
                           ("22x64", (bt, 22, 22, 64))):
            x = jnp.asarray(rng.standard_normal(shape) + 0.5, dtype)
            p = {}
            for i in range(4):
                p[f"s{i}"] = jnp.ones((shape[-1],), jnp.float32)
                p[f"b{i}"] = jnp.zeros((shape[-1],), jnp.float32)
                p[f"a{i}"] = jnp.full((shape[-1],), 0.25, jnp.float32)
            ms = two_length(make_loop(shape, "xla", 1), p, x)
            results[f"bnact4_{tag}_{dname}_xla"] = round(ms, 2)
            print(f"bnact4_{tag}_{dname}_xla: {ms:.2f} ms", flush=True)
            variants = [("pallas", bb) for bb in (1, 4, 16)
                        if shape[0] % bb == 0]
            # flat 2-D: block_rows over N = B*H*W (sublane-aligned)
            n_rows = shape[0] * shape[1] * shape[2]
            variants += [("pallas_flat", bb) for bb in (2048, 8192)
                         if n_rows % bb == 0]
            for impl, bb in variants:
                key = f"bnact4_{tag}_{dname}_{impl}_bb{bb}"
                try:
                    ms = two_length(make_loop(shape, impl, bb), p, x)
                except Exception as e:  # Mosaic rejection is a result too
                    results[key] = f"error: {type(e).__name__}"
                    print(f"{key}: ERROR {type(e).__name__}: {e}"[:300],
                          flush=True)
                    continue
                results[key] = round(ms, 2)
                print(f"{key}: {ms:.2f} ms", flush=True)

    # numerics spot-check on device (f32): kernel == composition
    shape = (bt, 22, 22, 64)
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 1.5, jnp.float32)
    s = jnp.ones((64,), jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    a = jnp.full((64,), 0.25, jnp.float32)
    try:
        y_k, _, _ = jax.jit(
            lambda x: bn_prelu_train(x, s, b, a, 1e-5, False, 4))(x)
        y_x = jax.jit(lambda x: prelu(bn1_xla(x, s, b), a))(x)
        d = float(jnp.max(jnp.abs(y_k - y_x)))
        results["pallas_vs_xla_max_diff_f32"] = d
        print(f"pallas vs xla max diff (f32, on device): {d:.3e}", flush=True)
    except Exception as e:
        results["pallas_vs_xla_max_diff_f32"] = f"error: {type(e).__name__}"

    print(json.dumps({"batch": batch, **results}), flush=True)


if __name__ == "__main__":
    main()
