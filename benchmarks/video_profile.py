"""Stage-wise timing of the video train step: transform / Conv3D frontend /
ResNet trunk / TCN+loss, each fwd+bwd in isolation, to locate the MFU
bottleneck (VERDICT r1 #3).

Each stage is jitted separately with a cotangent-sum loss so its backward
runs too. Iterations are CHAINED (params <- params - 1e-6*grads) and timed
to a forcing device->host fetch — on this rig's remote tunnel,
block_until_ready returns before execution and un-chained replays can be
elided entirely (see benchmarks/_timing.py).

Run on the TPU: ``python benchmarks/video_profile.py [dtype] [batch]``.
"""

import json
import sys
import time

import numpy as np

T = 29
SIZE = 96
N_ITERS = 40


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    from deeplip_tpu.models.lipreading import Lipreading
    from deeplip_tpu.models.resnet import ResNetTrunk
    from deeplip_tpu.models.tcn import MultibranchTemporalConvNet
    from deeplip_tpu.ops import video as V

    dtype = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    def sgd(params, grads):
        return jax.tree.map(lambda p, g: p - 1e-6 * g.astype(p.dtype), params, grads)

    from benchmarks._timing import force_fetch

    def bench_chained(step, params, *args):
        """step(params, *args) -> (loss, grads); iterations chained through
        params, timed to a forcing fetch (benchmarks/_timing.py — block
        alone does not wait on this rig's tunnel)."""
        params = sgd(params, step(params, *args)[1])  # compile + warm
        force_fetch(params)
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            params = sgd(params, step(params, *args)[1])
        force_fetch(params)
        return (time.perf_counter() - t0) / N_ITERS * 1000

    rng = np.random.default_rng(0)
    clips_u8 = jax.device_put(
        rng.integers(0, 255, (batch, T, SIZE, SIZE)).astype(np.uint8))
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), N_ITERS + 1))

    # --- stage 1: transform (fwd only; chained through distinct keys)
    tf = jax.jit(
        lambda c, k, eps: V.train_transform(c, k, (88, 88))[..., None]
        + eps[0] * 1e-38)
    x88 = tf(clips_u8, keys[0], jnp.zeros((1,), jnp.float32))
    force_fetch(x88)
    t0 = time.perf_counter()
    out = x88
    for i in range(N_ITERS):
        out = tf(clips_u8, keys[i % 2], out.ravel()[:1])
    force_fetch(out)
    ms_tf = (time.perf_counter() - t0) / N_ITERS * 1000
    print(f"transform: {ms_tf:.2f} ms", flush=True)

    # --- stage 2: Conv3D frontend (conv+bn+prelu+maxpool) fwd+bwd
    class Frontend(nn.Module):
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x, train=True):
            from deeplip_tpu.models.resnet import PReLU

            x = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                        padding=[(2, 2), (3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype)(x.astype(self.dtype))
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             use_running_average=not train)(x)
            x = PReLU()(x)
            return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                               padding=[(0, 0), (1, 1), (1, 1)])

    fe = Frontend(dtype=dtype)
    fe_vars = fe.init(keys[0], x88[:1], train=False)

    @jax.jit
    def fe_step(params, x):
        def loss(p):
            y, _ = fe.apply({"params": p, "batch_stats": fe_vars["batch_stats"]},
                            x, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(params)

    ms_fe = bench_chained(fe_step, fe_vars["params"], x88)
    print(f"frontend: {ms_fe:.2f} ms", flush=True)
    y_fe = fe.apply(fe_vars, x88, train=False)

    # --- stage 3: ResNet trunk over folded frames fwd+bwd
    frames = y_fe.reshape((-1,) + y_fe.shape[2:]).astype(dtype)
    trunk = ResNetTrunk(dtype=dtype)
    tr_vars = trunk.init(keys[0], frames[:2], train=False)

    @jax.jit
    def tr_step(params, x):
        def loss(p):
            y, _ = trunk.apply(
                {"params": p, "batch_stats": tr_vars["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(params)

    ms_tr = bench_chained(tr_step, tr_vars["params"], frames)
    print(f"trunk: {ms_tr:.2f} ms", flush=True)

    # --- stage 4: TCN + classifier fwd+bwd
    feats = jnp.zeros((batch, T, 512), dtype)
    tcn = MultibranchTemporalConvNet((768,) * 4, (3, 5, 7), 0.2, "prelu", False)
    tcn_vars = tcn.init({"params": keys[0], "dropout": keys[1]}, feats[:2],
                        train=False)

    @jax.jit
    def tcn_step(params, x):
        def loss(p):
            y, _ = tcn.apply(
                {"params": p, "batch_stats": tcn_vars["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(params)

    ms_tcn = bench_chained(tcn_step, tcn_vars["params"], feats)
    print(f"tcn: {ms_tcn:.2f} ms", flush=True)

    # --- full step, for reference
    model = Lipreading.from_config(
        {"backbone_type": "resnet", "relu_type": "prelu",
         "tcn_kernel_size": [3, 5, 7], "tcn_num_layers": 4,
         "tcn_dropout": 0.2, "tcn_dwpw": False, "tcn_width_mult": 1,
         "width_mult": 1.0}, num_classes=500).clone(dtype=dtype)
    mv = model.init(keys[0], jnp.zeros((1, 4, 88, 88, 1), jnp.float32))
    lengths = jnp.full((batch,), T, jnp.int32)
    labels = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def full_step(params, c, k):
        x = V.train_transform(c, k, (88, 88))[..., None]

        def loss(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": mv["batch_stats"]}, x,
                lengths=lengths, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(batch), labels])
        return jax.value_and_grad(loss)(params)

    ms_full = bench_chained(full_step, mv["params"], clips_u8, keys[0])

    print(json.dumps({
        "dtype": str(dtype.__name__), "batch": batch,
        "ms_transform": round(ms_tf, 2), "ms_frontend": round(ms_fe, 2),
        "ms_trunk": round(ms_tr, 2), "ms_tcn": round(ms_tcn, 2),
        "ms_stage_sum": round(ms_tf + ms_fe + ms_tr + ms_tcn, 2),
        "ms_full_step": round(ms_full, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
