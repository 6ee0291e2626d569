"""BN bandwidth probe: two-pass vs single-pass batch stats, and frontend
remat variants (VERDICT r2 #2, post-s2d follow-up).

``TorchBatchNorm`` computes the biased batch variance with the two-pass
formula (mean, then mean((x-mean)^2)) — 3 HBM reads of the activation in
the forward (mean pass, var pass, normalize pass). The single-pass form
(E[x], E[x^2] in one fused multi-output reduction, var = E[x^2] - E[x]^2)
is 2 reads. On bandwidth-bound BN+PReLU stacks that is a ~25% fwd saving;
this probe measures fwd+bwd at the two hot shapes (frontend post-conv
(B*T,44,44,64) and trunk stage-1 (B*T,22,22,64)) plus the full frontend
chain (s2d conv + BN + PReLU + maxpool) under both formulas.

Run on the TPU: ``python benchmarks/bn_probe.py [batch]``.
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

    def bn2(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (x.astype(dtype) - mean.astype(dtype)) * inv.astype(dtype)
        return y * scale.astype(dtype) + bias.astype(dtype)

    def bn1(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        msq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (x.astype(dtype) - mean.astype(dtype)) * inv.astype(dtype)
        return y * scale.astype(dtype) + bias.astype(dtype)

    def prelu(x, a):
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)

    # --- bare BN+PReLU chain (4 pairs) at the two hot shapes
    def make_bnact_loop(bn, shape):
        def loss(p, xx):
            x = xx
            for i in range(4):
                x = bn(x, p[f"s{i}"], p[f"b{i}"])
                x = prelu(x, p[f"a{i}"])
            return jnp.sum(x.astype(jnp.float32) ** 2) * 1e-9

        @partial(jax.jit, static_argnames="iters")
        def loop(p, xx, iters):
            def body(_, p):
                g = jax.grad(loss)(p, xx)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)

            p = jax.lax.fori_loop(0, iters, body, p)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p))

        return loop

    for tag, shape in (("44x64", (bt, 44, 44, 64)), ("22x64", (bt, 22, 22, 64))):
        x = jnp.asarray(rng.standard_normal(shape) + 0.5, dtype)
        p = {}
        for i in range(4):
            p[f"s{i}"] = jnp.ones((shape[-1],), jnp.float32)
            p[f"b{i}"] = jnp.zeros((shape[-1],), jnp.float32)
            p[f"a{i}"] = jnp.float32(0.25)
        for name, bn in (("bn2pass", bn2), ("bn1pass", bn1)):
            ms = two_length(make_bnact_loop(bn, shape), p, x)
            results[f"bnact4_{tag}_{name}"] = round(ms, 2)
            print(f"bnact4_{tag}_{name}: {ms:.2f} ms", flush=True)

    # --- full frontend chain: s2d conv + BN + PReLU + maxpool, fwd+bwd
    x88 = jnp.asarray(rng.standard_normal((batch, T, 88, 88, 1)), dtype)
    kernel = jnp.asarray(rng.standard_normal((5, 7, 7, 1, 64)) * 0.05,
                         jnp.float32)

    def make_frontend_loop(bn, remat):
        def chain(p, xx):
            y = frontend_conv3d_s2d(p["k"], xx)
            y = bn(y, p["s"], p["b"])
            y = prelu(y, p["a"])
            from flax.linen import max_pool
            return max_pool(y, (1, 3, 3), strides=(1, 2, 2),
                            padding=[(0, 0), (1, 1), (1, 1)])

        if remat:
            chain = jax.checkpoint(
                chain, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

        def loss(p, xx):
            return jnp.sum(chain(p, xx).astype(jnp.float32) ** 2) * 1e-9

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

    pf = {"k": kernel, "s": jnp.ones((64,), jnp.float32),
          "b": jnp.zeros((64,), jnp.float32), "a": jnp.float32(0.25)}
    for name, bn, remat in (("fe_bn2pass", bn2, False),
                            ("fe_bn1pass", bn1, False),
                            ("fe_bn1pass_remat", bn1, True)):
        ms = two_length(make_frontend_loop(bn, remat), pf, x88)
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)

    # numerics: 1-pass vs 2-pass stats on realistic post-conv activations
    xs = jnp.asarray(rng.standard_normal((bt, 22, 22, 64)) * 2 + 1.5,
                     jnp.float32)
    s1 = jnp.ones((64,), jnp.float32)
    b0 = jnp.zeros((64,), jnp.float32)
    d = float(jnp.max(jnp.abs(bn1(xs, s1, b0).astype(jnp.float32)
                              - bn2(xs, s1, b0).astype(jnp.float32))))
    results["bn1_vs_bn2_max_diff_f32in"] = d
    print(f"bn1 vs bn2 max output diff (f32 in, mean~1.5σ): {d:.3e}",
          flush=True)

    print(json.dumps({"batch": batch, "dtype": "bf16", **results}), flush=True)


if __name__ == "__main__":
    main()
