"""Per-component roofline attribution of the video train step (VERDICT r2 #2).

Isolates each piece of the Lipreading training step — transform, Conv3D
frontend, ResNet trunk (whole / per stage / fwd-only), bare convs at trunk
shapes, BN+PReLU pairs, TCN — each measured fwd+bwd with the loop INSIDE
one jit (``lax.fori_loop`` with an in-loop SGD update so iterations chain
through params) and a two-length fit, the only honest recipe on this rig
(benchmarks/_timing.py: ``block_until_ready`` does not wait on the remote
tunnel, and eager chaining ops pay ~100 ms relay dispatch each — the r2
``video_profile.py`` stage numbers were polluted by exactly that).

Run on the TPU:
  python benchmarks/video_attribution.py [batch] [component,...]

Components: transform frontend trunk trunk_fwd stage1 stage2 stage3 stage4
conv bnact tcn full  (default: all).
"""

import json
import sys
import time
from functools import partial

import numpy as np

T = 29
SIZE = 96
N_SHORT = 2
N_LONG = 10


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.models.lipreading import Lipreading
    from deeplip_tpu.models.resnet import BasicBlock, PReLU
    from deeplip_tpu.models.norm import TorchBatchNorm
    from deeplip_tpu.models.tcn import MultibranchTemporalConvNet
    from deeplip_tpu.ops import video as V

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    dtype = jnp.bfloat16
    bt = batch * T
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

    def bench_train(name, module, x, has_stats=True, rngs_dropout=False,
                    group=None):
        """fwd+bwd+sgd per iteration, all inside one jit."""
        if only and name not in only and group not in only:
            return
        init_rngs = {"params": jax.random.PRNGKey(0)}
        if rngs_dropout:
            init_rngs["dropout"] = jax.random.PRNGKey(1)
        variables = module.init(init_rngs, x[:2], train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def loss_fn(p, xx):
            kw = dict(train=True)
            apply_rngs = {"dropout": jax.random.PRNGKey(1)} if rngs_dropout else None
            if has_stats:
                y, _ = module.apply(
                    {"params": p, "batch_stats": stats}, xx,
                    mutable=["batch_stats"], rngs=apply_rngs, **kw)
            else:
                y = module.apply({"params": p}, xx, rngs=apply_rngs, **kw)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

        @partial(jax.jit, static_argnames="iters")
        def loop(p, xx, iters):
            def body(_, p):
                g = jax.grad(loss_fn)(p, xx)
                return jax.tree.map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

            p = jax.lax.fori_loop(0, iters, body, p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(p))

        ms = two_length(loop, params, x)
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    clips_u8 = jax.device_put(
        rng.integers(0, 255, (batch, T, SIZE, SIZE)).astype(np.uint8))

    # --- transform (fwd only; per-iteration key from fold_in)
    if not only or "transform" in only:
        @partial(jax.jit, static_argnames="iters")
        def tf_loop(c, iters):
            def body(i, acc):
                k = jax.random.fold_in(jax.random.PRNGKey(0), i)
                # acc chains iterations (runtime value: not foldable) and
                # depends on the output, so no iteration can be elided; the
                # 1e-38 contribution vanishes in the f32 addition
                x = V.train_transform(c + acc.astype(jnp.uint8), k, (88, 88))
                return acc + jnp.sum(x[0, 0, :8, 0]).astype(jnp.float32) * 1e-38

            acc = jax.lax.fori_loop(0, iters, body, jnp.float32(0))
            return acc

        ms = two_length(tf_loop, clips_u8)
        results["transform"] = round(ms, 2)
        print(f"transform: {ms:.2f} ms", flush=True)

    x88 = jnp.asarray(
        rng.standard_normal((batch, T, 88, 88, 1)), dtype)

    # --- Conv3D frontend (conv+BN+PReLU+maxpool) fwd+bwd
    class Frontend(nn.Module):
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                        padding=[(2, 2), (3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype)(x.astype(self.dtype))
            x = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                               use_running_average=not train)(x)
            x = PReLU()(x)
            return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                               padding=[(0, 0), (1, 1), (1, 1)])

    bench_train("frontend", Frontend(dtype=dtype), x88)

    # --- trunk: whole, fwd-only, and per stage at real shapes
    from deeplip_tpu.models.resnet import ResNetTrunk

    frames22 = jnp.asarray(rng.standard_normal((bt, 22, 22, 64)), dtype)
    bench_train("trunk", ResNetTrunk(dtype=dtype), frames22)

    if not only or "trunk_fwd" in only:
        trunk = ResNetTrunk(dtype=dtype)
        tv = trunk.init(jax.random.PRNGKey(0), frames22[:2], train=False)

        @partial(jax.jit, static_argnames="iters")
        def fwd_loop(v, xx, iters):
            def body(_, acc):
                y, _ = trunk.apply(
                    {"params": v, "batch_stats": tv["batch_stats"]},
                    xx + acc * 1e-38, train=True, mutable=["batch_stats"])
                return acc + jnp.sum(y[0].astype(jnp.float32)) * 1e-38

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        ms = two_length(fwd_loop, tv["params"], frames22)
        results["trunk_fwd"] = round(ms, 2)
        print(f"trunk_fwd: {ms:.2f} ms", flush=True)

    class Stage(nn.Module):
        planes: int
        stride: int
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            x = BasicBlock(planes=self.planes, stride=self.stride,
                           dtype=self.dtype, name="b0")(x, train=train)
            return BasicBlock(planes=self.planes, stride=1,
                              dtype=self.dtype, name="b1")(x, train=train)

    stage_in = {
        "stage1": ((bt, 22, 22, 64), 64, 1),
        "stage2": ((bt, 22, 22, 64), 128, 2),
        "stage3": ((bt, 11, 11, 128), 256, 2),
        "stage4": ((bt, 6, 6, 256), 512, 2),
    }
    for name, (shape, planes, stride) in stage_in.items():
        xs = jnp.asarray(rng.standard_normal(shape), dtype)
        bench_train(name, Stage(planes=planes, stride=stride, dtype=dtype), xs)

    # --- bare conv3x3 fwd+bwd at each trunk shape (no BN/act)
    class Conv1(nn.Module):
        planes: int
        stride: int
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(self.planes, (3, 3),
                           strides=(self.stride, self.stride),
                           padding=[(1, 1), (1, 1)], use_bias=False,
                           dtype=self.dtype)(x)

    conv_shapes = {
        "conv_22x64": ((bt, 22, 22, 64), 64, 1),
        "conv_11x128": ((bt, 11, 11, 128), 128, 1),
        "conv_6x256": ((bt, 6, 6, 256), 256, 1),
        "conv_3x512": ((bt, 3, 3, 512), 512, 1),
        "conv_s2_22to11": ((bt, 22, 22, 64), 128, 2),
    }
    if not only or "conv" in only:
        for name, (shape, planes, stride) in conv_shapes.items():
            xs = jnp.asarray(rng.standard_normal(shape), dtype)
            bench_train(name, Conv1(planes=planes, stride=stride, dtype=dtype),
                        xs, has_stats=False, group="conv")

    # --- BN+PReLU pair fwd+bwd at layer1 shape (cost of norm/act alone)
    class BnAct(nn.Module):
        dtype: jnp.dtype
        n: int = 4

        @nn.compact
        def __call__(self, x, train=True):
            for i in range(self.n):
                x = TorchBatchNorm(momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype,
                                   use_running_average=not train,
                                   name=f"bn{i}")(x)
                x = PReLU(name=f"act{i}")(x)
            return x

    if not only or "bnact" in only:
        xs = jnp.asarray(rng.standard_normal((bt, 22, 22, 64)), dtype)
        bench_train("bnact4_22x64", BnAct(dtype=dtype), xs, group="bnact")

    # --- TCN + head fwd+bwd
    feats = jnp.asarray(rng.standard_normal((batch, T, 512)), dtype)
    bench_train(
        "tcn",
        MultibranchTemporalConvNet((768,) * 4, (3, 5, 7), 0.2, "prelu", False),
        feats, rngs_dropout=True)

    # --- full train step fwd+bwd (cross-check vs fori_step_bench)
    if not only or "full" in only:
        model = Lipreading.from_config(
            {"backbone_type": "resnet", "relu_type": "prelu",
             "tcn_kernel_size": [3, 5, 7], "tcn_num_layers": 4,
             "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_width_mult": 1,
             "width_mult": 1.0}, num_classes=500).clone(dtype=dtype)
        mv = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 88, 88, 1), jnp.float32))
        lengths = jnp.full((batch,), T, jnp.int32)
        labels = jnp.zeros((batch,), jnp.int32)

        def full_loss(p, key):
            kt, kd = jax.random.split(key)
            x = V.train_transform(clips_u8, kt, (88, 88))[..., None]
            logits, _ = model.apply(
                {"params": p, "batch_stats": mv["batch_stats"]}, x,
                lengths=lengths, train=True, mutable=["batch_stats"],
                rngs={"dropout": kd})
            return jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(batch), labels])

        @partial(jax.jit, static_argnames="iters")
        def full_loop(p, iters):
            def body(i, p):
                g = jax.grad(full_loss)(
                    p, jax.random.fold_in(jax.random.PRNGKey(0), i))
                return jax.tree.map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

            p = jax.lax.fori_loop(0, iters, body, p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(p))

        ms = two_length(full_loop, mv["params"])
        results["full"] = round(ms, 2)
        print(f"full: {ms:.2f} ms", flush=True)

    print(json.dumps({"batch": batch, "dtype": "bf16", **results}),
          flush=True)


if __name__ == "__main__":
    main()
