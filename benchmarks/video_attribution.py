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


def _max_pool_custom_vjp(jax, jnp):
    """NEGATIVE RESULT, kept for the record: a hand-written equality-routing
    backward for the frontend max-pool ((1,3,3)/s(1,2,2)/p(0,1,1), even
    H/W), decomposed over 2x2 spatial phases (even row 2m lies in exactly
    one window, odd 2m+1 in at most two). Hypothesis was that XLA's
    SelectAndScatter grad pays ~4x its bandwidth roofline; measured r3
    (bs 128, (128,29,44,44,64) bf16): custom 28.0 ms vs S&S 16.0 ms fwd+bwd
    — the elementwise compare + phase reassembly traffic LOSES to the
    native lowering, so the model keeps nn.max_pool. Ties also differ
    (this sums the cotangent into all tied maxima; S&S routes to first)."""

    def fwd_raw(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])

    @jax.custom_vjp
    def pool(x):
        return fwd_raw(x)

    def vjp_fwd(x):
        y = fwd_raw(x)
        return y, (x, y)

    def vjp_bwd(res, g):
        x, y = res
        b, t, h, w, c = x.shape
        oh, ow = h // 2, w // 2
        g = g.astype(x.dtype)
        ninf = jnp.asarray(-jnp.inf, x.dtype)
        zero = jnp.asarray(0, x.dtype)

        def shift_up(a, fill):
            pad = jnp.full(a.shape[:2] + (1,) + a.shape[3:], fill, a.dtype)
            return jnp.concatenate([a[:, :, 1:], pad], axis=2)

        def shift_left(a, fill):
            pad = jnp.full(a.shape[:3] + (1,) + a.shape[4:], fill, a.dtype)
            return jnp.concatenate([a[:, :, :, 1:], pad], axis=3)

        ys = (y, shift_up(y, ninf))
        gs = (g, shift_up(g, zero))
        x6 = x.reshape(b, t, oh, 2, ow, 2, c)
        phases = []
        for ry in (0, 1):
            for rx in (0, 1):
                xp = x6[:, :, :, ry, :, rx, :]
                acc = jnp.zeros_like(xp)
                for a in (0,) if ry == 0 else (0, 1):
                    ya, ga = ys[a], gs[a]
                    for bc in (0,) if rx == 0 else (0, 1):
                        yab = shift_left(ya, ninf) if bc else ya
                        gab = shift_left(ga, zero) if bc else ga
                        acc = acc + jnp.where(xp == yab, gab, zero)
                phases.append(acc)
        row0 = jnp.stack(phases[0:2], axis=-2)
        row1 = jnp.stack(phases[2:4], axis=-2)
        return (jnp.stack([row0, row1], axis=3).reshape(b, t, h, w, c),)

    pool.defvjp(vjp_fwd, vjp_bwd)
    return pool


def _max_pool_phases(jnp, jax):
    """NEGATIVE RESULT #2, kept for the record: the (1,3,3)/s(1,2,2)/p(0,1,1)
    max-pool as separable elementwise phase maxima (per axis,
    y[m] = max(x[2m-1], x[2m], x[2m+1]) over even/odd strided slices) — no
    reduce_window/SelectAndScatter anywhere. Hypothesis was that S&S's
    backward composes badly with the trunk (measured: pool+trunk 103.4 ms
    vs ~58 for the parts). Measured r3: 82.1 ms standalone fwd+bwd at
    (128,29,44,44,64) (vs 16.0 for S&S) and OOM composed — the stride-2
    W-axis slices force XLA into a layout where C=64 pads to 128 lanes and
    T=29 to 32 sublanes (2.2x memory + traffic, straight from the OOM
    allocation dump), with f32 temps on top. Root cause, which also bounds
    the S&S path and the frontend/stage-1 BN+act: every non-MXU op on a
    C=64 NHWC tensor pays ~2.2x tile padding, and it cannot be fixed
    without changing model geometry (dense flat views cost a padded-tiled
    copy each way that eats the savings; convs pin the NHWC layout)."""

    def axis_max3_s2(a, axis):
        n = a.shape[axis]
        ae = jax.lax.slice_in_dim(a, 0, n, 2, axis)
        ao = jax.lax.slice_in_dim(a, 1, n, 2, axis)
        lo = jnp.full(ae.shape[:axis] + (1,) + ae.shape[axis + 1:],
                      -jnp.inf, a.dtype)
        ao_prev = jnp.concatenate(
            [lo, jax.lax.slice_in_dim(ao, 0, n // 2 - 1, 1, axis)], axis)
        return jnp.maximum(jnp.maximum(ao_prev, ae), ao)

    return lambda x: axis_max3_s2(axis_max3_s2(x, 3), 2)


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

    # --- Conv3D frontend (conv+BN+PReLU+maxpool) fwd+bwd. ``frontend`` is
    # the model's real module (s2d fast path, models/lipreading.py);
    # ``frontend_direct`` keeps the pre-r3 direct Conv3D lowering for A/B.
    from deeplip_tpu.models.lipreading import FrontendConv3D

    class Frontend(nn.Module):
        dtype: jnp.dtype
        direct: bool = False

        @nn.compact
        def __call__(self, x, train=True):
            if self.direct:
                x = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                            padding=[(2, 2), (3, 3), (3, 3)], use_bias=False,
                            dtype=self.dtype)(x.astype(self.dtype))
            else:
                x = FrontendConv3D(64, dtype=self.dtype)(x)
            x = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                               use_running_average=not train)(x)
            x = PReLU()(x)
            return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                               padding=[(0, 0), (1, 1), (1, 1)])

    bench_train("frontend", Frontend(dtype=dtype), x88)
    bench_train("frontend_direct", Frontend(dtype=dtype, direct=True), x88)

    # --- trunk: whole, fwd-only, and per stage at real shapes
    from deeplip_tpu.models.resnet import ResNetTrunk

    frames22 = jnp.asarray(rng.standard_normal((bt, 22, 22, 64)), dtype)
    bench_train("trunk", ResNetTrunk(dtype=dtype), frames22)

    # trunk with a per-iteration VARYING input: in the composed model the
    # trunk input is recomputed every step, so nothing input-derived can be
    # hoisted out of the loop — measures how much of the isolated 'trunk'
    # number is loop-invariant hoisting vs real per-step cost
    if not only or "trunk_vary" in only:
        trunk_v = ResNetTrunk(dtype=dtype)
        tvv = trunk_v.init(jax.random.PRNGKey(0), frames22[:2], train=False)

        def tv_loss(p, xx):
            leaf = jax.tree_util.tree_leaves(p)[0]
            xv = xx + (jnp.sum(leaf) * 1e-38).astype(xx.dtype)
            y, _ = trunk_v.apply(
                {"params": p, "batch_stats": tvv["batch_stats"]}, xv,
                train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

        @partial(jax.jit, static_argnames="iters")
        def tv_loop(p, xx, iters):
            def body(_, p):
                g = jax.grad(tv_loss)(p, xx)
                return jax.tree.map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

            p = jax.lax.fori_loop(0, iters, body, p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(p))

        ms = two_length(tv_loop, tvv["params"], frames22)
        results["trunk_vary"] = round(ms, 2)
        print(f"trunk_vary: {ms:.2f} ms", flush=True)

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

    # --- bare maxpool (1,3,3)/s(1,2,2) fwd+bwd at the frontend shape
    # (bwd lowers to SelectAndScatter — historically slow on TPU)
    class MaxPool(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            # scalar shift param so the fori harness can chain iterations
            # through a gradient (paramless modules would be DCE'd)
            s = self.param("shift", nn.initializers.zeros, ())
            return nn.max_pool(x + s, (1, 3, 3), strides=(1, 2, 2),
                               padding=[(0, 0), (1, 1), (1, 1)])

    class MaxPoolVjp(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            s = self.param("shift", nn.initializers.zeros, ())
            return _max_pool_custom_vjp(jax, jnp)(x + s)

    if not only or "maxpool" in only:
        xs = jnp.asarray(rng.standard_normal((batch, T, 44, 44, 64)), dtype)
        bench_train("maxpool", MaxPool(), xs, has_stats=False,
                    group="maxpool")
        bench_train("maxpool_vjp", MaxPoolVjp(), xs, has_stats=False,
                    group="maxpool")

    # --- frontend+trunk composed (chasing the composition gap: components
    # measured in isolation fuse/schedule differently than the full graph)
    class FeTrunk(nn.Module):
        dtype: jnp.dtype
        remat: bool = False

        @nn.compact
        def __call__(self, x, train=True):
            fe = Frontend
            if self.remat:
                # recompute the frontend's big (B,T,44,44,64) activations in
                # the backward instead of keeping them live across the whole
                # trunk fwd+bwd (memory-pressure hypothesis for the
                # composition gap)
                fe = nn.remat(Frontend, static_argnums=(2,))
            x = fe(dtype=self.dtype, name="fe")(x, train)
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
            return ResNetTrunk(dtype=self.dtype, name="trunk")(x, train=train)

    bench_train("fe_trunk", FeTrunk(dtype=dtype), x88, group="fe_trunk")
    bench_train("fe_trunk_remat", FeTrunk(dtype=dtype, remat=True), x88,
                group="fe_trunk")

    # bisecting the composition gap: frontend+stage1 only, and pool+trunk
    class FeS1(nn.Module):
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            x = Frontend(dtype=self.dtype, name="fe")(x, train=train)
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
            return Stage(planes=64, stride=1, dtype=self.dtype,
                         name="s1")(x, train=train)

    class PoolTrunk(nn.Module):
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            s = self.param("shift", nn.initializers.zeros, ())
            x = nn.max_pool(x + s, (1, 3, 3), strides=(1, 2, 2),
                            padding=[(0, 0), (1, 1), (1, 1)])
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
            return ResNetTrunk(dtype=self.dtype, name="trunk")(x, train=train)

    class PoolPhasesTrunk(nn.Module):
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            s = self.param("shift", nn.initializers.zeros, ())
            x = _max_pool_phases(jnp, jax)(x + s.astype(x.dtype))
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
            return ResNetTrunk(dtype=self.dtype, name="trunk")(x, train=train)

    class MaxPoolPhases(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            s = self.param("shift", nn.initializers.zeros, ())
            return _max_pool_phases(jnp, jax)(x + s.astype(x.dtype))

    class PoolVjpTrunk(nn.Module):
        """pool_trunk with the equality-routing VJP instead of S&S: the
        custom backward loses standalone (28.0 vs 16.0 ms) but the +36 ms
        pool_trunk composition gap was only ever measured THROUGH
        SelectAndScatter — if the gap is S&S-specific scheduling, trading
        +12 ms standalone for -36 ms composition is a net win."""

        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            s = self.param("shift", nn.initializers.zeros, ())
            x = _max_pool_custom_vjp(jax, jnp)(x + s)
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
            return ResNetTrunk(dtype=self.dtype, name="trunk")(x, train=train)

    bench_train("fe_s1", FeS1(dtype=dtype), x88, group="fe_trunk")
    if not only or {"pool_trunk", "fe_trunk", "maxpool_phases",
                    "poolvjp_trunk"} & only:
        x44 = jnp.asarray(rng.standard_normal((batch, T, 44, 44, 64)), dtype)
        bench_train("pool_trunk", PoolTrunk(dtype=dtype), x44,
                    group="fe_trunk")
        bench_train("poolvjp_trunk", PoolVjpTrunk(dtype=dtype), x44,
                    group="poolvjp_trunk")
        bench_train("maxpool_phases", MaxPoolPhases(), x44, has_stats=False,
                    group="maxpool_phases")
        bench_train("poolphases_trunk", PoolPhasesTrunk(dtype=dtype), x44,
                    group="maxpool_phases")

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
