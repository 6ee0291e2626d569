"""TorchBatchNorm vs torch.nn.BatchNorm1d: train-mode output AND the
running-stat update (torch accumulates the Bessel-corrected batch variance
into running_var — the semantic flax's BatchNorm misses)."""

import numpy as np
import torch

import jax.numpy as jnp

from deeplip_tpu.models.norm import TorchBatchNorm


def test_torch_batchnorm_train_and_running_stats():
    rng = np.random.default_rng(0)
    b, t, c = 4, 7, 5
    tbn = torch.nn.BatchNorm1d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.standard_normal(c), dtype=torch.float32))
        tbn.bias.copy_(torch.tensor(rng.standard_normal(c), dtype=torch.float32))
        tbn.running_mean.normal_(0, 0.3)
        tbn.running_var.uniform_(0.5, 2.0)

    ours = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
            "var": jnp.asarray(tbn.running_var.numpy().copy()),
        },
    }

    tbn.train()
    for step in range(3):
        x = rng.standard_normal((b, t, c)).astype(np.float32) * (1 + step) + step
        # torch BatchNorm1d takes (B, C, T)
        y_t = tbn(torch.tensor(np.transpose(x, (0, 2, 1)))).detach().numpy()
        y_o, upd = ours.apply(
            variables, jnp.asarray(x), use_running_average=False,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(y_o), np.transpose(y_t, (0, 2, 1)), atol=2e-6)
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-6)

    # eval mode uses the accumulated running stats
    tbn.eval()
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    y_t = tbn(torch.tensor(np.transpose(x, (0, 2, 1)))).detach().numpy()
    y_o = ours.apply(variables, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(
        np.asarray(y_o), np.transpose(y_t, (0, 2, 1)), atol=2e-6)
