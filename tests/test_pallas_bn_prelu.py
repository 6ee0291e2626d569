"""Pallas fused BN+PReLU kernel vs the XLA composition (interpret mode).

The kernel is a measurement vehicle for the VERDICT r4 #5 roofline box
(see ``ops/pallas/bn_prelu_kernel.py``); these tests pin its numerics to
the shipped ``TorchBatchNorm``+``PReLU`` path so the TPU benchmark
(``benchmarks/bn_prelu_bench.py``) races two provably-identical ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplip_tpu.ops.pallas.bn_prelu_kernel import (
    bn_prelu_reference,
    bn_prelu_train,
)


def _inputs(shape=(6, 5, 4, 8), seed=0, mean_shift=0.0):
    rng = np.random.default_rng(seed)
    c = shape[-1]
    x = (rng.standard_normal(shape) + mean_shift).astype(np.float32)
    scale = (0.5 + rng.random(c)).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32) * 0.3
    alpha = np.full((c,), 0.25, np.float32)
    return (jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(alpha))


def test_forward_matches_xla_composition():
    x, scale, bias, alpha = _inputs()
    y, mean, var = bn_prelu_train(x, scale, bias, alpha, 1e-5, True)
    y_ref, mean_ref, var_ref = bn_prelu_reference(x, scale, bias, alpha)
    # sequential grid accumulation vs XLA's tree reduce: ULP-level only
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-6, rtol=1e-6)


def test_forward_matches_torch_batchnorm_module():
    """Against the actual shipped modules (TorchBatchNorm + PReLU),
    train mode, including the running-stat update inputs (mean/var)."""
    from deeplip_tpu.models.norm import TorchBatchNorm
    from deeplip_tpu.models.resnet import PReLU

    x, scale, bias, alpha = _inputs(shape=(4, 3, 3, 8), seed=1)

    class Pair(TorchBatchNorm):
        pass

    bn = TorchBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), x)
    variables = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": variables["batch_stats"],
    }
    z_ref, updates = bn.apply(variables, x, mutable=["batch_stats"])
    y_ref = jnp.where(z_ref >= 0, z_ref, alpha * z_ref)

    y, mean, var = bn_prelu_train(x, scale, bias, alpha, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-6, rtol=1e-6)
    # torch running update: mean <- m*old + (1-m)*mean_b (old = zeros/ones)
    n = x.size // x.shape[-1]
    got_var = np.asarray(updates["batch_stats"]["var"])
    want_var = 0.9 * 1.0 + 0.1 * np.asarray(var) * n / (n - 1)
    np.testing.assert_allclose(got_var, want_var, rtol=1e-6)
    got_mean = np.asarray(updates["batch_stats"]["mean"])
    np.testing.assert_allclose(got_mean, 0.1 * np.asarray(mean), rtol=1e-5,
                               atol=1e-7)


def test_gradients_match_xla_composition():
    """VJP parity: d/d{x, scale, bias, alpha} of a scalar loss through the
    fused kernel equals autodiff through the XLA composition."""
    x, scale, bias, alpha = _inputs(shape=(5, 4, 4, 8), seed=2,
                                    mean_shift=0.7)
    w = jnp.asarray(
        np.random.default_rng(3).standard_normal(x.shape).astype(np.float32))

    def loss_kernel(x, s, b, a):
        y, _, _ = bn_prelu_train(x, s, b, a, 1e-5, True)
        return jnp.sum(y * w)

    def loss_ref(x, s, b, a):
        y, _, _ = bn_prelu_reference(x, s, b, a)
        return jnp.sum(y * w)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(x, scale, bias, alpha)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, bias, alpha)
    for got, want, name in zip(g_k, g_r, ["dx", "dscale", "dbias", "dalpha"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4,
            err_msg=name)


def test_gradients_match_f64_autodiff():
    """Float64 ground truth: the analytic batch-stats BN backward inside
    the kernel is the true derivative (not just XLA-composition-equal)."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(5)
        x64 = rng.standard_normal((3, 2, 2, 4))
        s64 = 0.5 + rng.random(4)
        b64 = rng.standard_normal(4) * 0.2
        a64 = np.full((4,), 0.25)
        w64 = rng.standard_normal(x64.shape)

        def loss_ref64(x, s, b, a):
            y, _, _ = bn_prelu_reference(x, s, b, a)
            return jnp.sum(y * jnp.asarray(w64))

        g64 = jax.grad(loss_ref64, argnums=(0, 1, 2, 3))(
            jnp.asarray(x64), jnp.asarray(s64), jnp.asarray(b64),
            jnp.asarray(a64))
    finally:
        jax.config.update("jax_enable_x64", False)

    x = jnp.asarray(x64, jnp.float32)
    w = jnp.asarray(w64, jnp.float32)

    def loss_kernel(x, s, b, a):
        y, _, _ = bn_prelu_train(x, s, b, a, 1e-5, True)
        return jnp.sum(y * w)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
        x, jnp.asarray(s64, jnp.float32), jnp.asarray(b64, jnp.float32),
        jnp.asarray(a64, jnp.float32))
    for got, want, name in zip(g_k, g64, ["dx", "dscale", "dbias", "dalpha"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want, np.float32), atol=1e-4,
            rtol=1e-3, err_msg=name)


def test_block_rows_equivalence():
    """block_rows>1 (bigger grid blocks) computes the same thing, and a
    non-divisor raises instead of silently mis-tiling."""
    x, scale, bias, alpha = _inputs(shape=(6, 5, 4, 8), seed=4)
    y1, m1, v1 = bn_prelu_train(x, scale, bias, alpha, 1e-5, True, 1)
    y3, m3, v3 = bn_prelu_train(x, scale, bias, alpha, 1e-5, True, 3)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y3), atol=2e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v3), rtol=1e-6)
    with pytest.raises(ValueError, match="divide"):
        bn_prelu_train(x, scale, bias, alpha, 1e-5, True, 4)


@pytest.mark.parametrize("shape", [(2, 8), (3, 7, 8), (1, 4, 4, 4, 8)])
def test_other_ranks(shape):
    """2-D/3-D/5-D leading-axis grids all work (C always last)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = shape[-1]
    one = jnp.ones((c,), jnp.float32)
    zero = jnp.zeros((c,), jnp.float32)
    alpha = jnp.full((c,), 0.25, jnp.float32)
    y, mean, var = bn_prelu_train(x, one, zero, alpha, 1e-5, True)
    y_ref, mean_ref, var_ref = bn_prelu_reference(x, one, zero, alpha)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-6)
