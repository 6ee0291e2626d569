"""Audio ResNet arch variant: shapes, interface parity, trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplip_tpu.models.audio_resnet import AudioResNet

OPTS = {
    "arch": "resnet",
    "resnet": {
        "input_dim": 1,
        "hidden_dim": [16, 32, 48],
        "residual_block_layers": [1, 1, 1],
        "embedding_dim": 24,
        "pooling": "average",
    },
}


def test_shapes_and_embedding_taps():
    net = AudioResNet.from_config(OPTS)
    x = jnp.ones((2, 64, 24))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 24)
    xv, xa = net.apply(variables, x, method=net.extract_embedding)
    assert xv.shape == (2, 24) and xa.shape == (2, 24)


def test_masked_pooling_close_to_trimmed():
    """SAME-padded conv stack: masked pooling approximates the trimmed clip
    (boundary taps see padding, like any SAME CNN; interior dominates)."""
    net = AudioResNet.from_config(OPTS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 24)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    ref, _ = net.apply(variables, x, method=net.extract_embedding)
    xpad = jnp.concatenate([x, jnp.zeros((1, 32, 24))], axis=1)
    got, _ = net.apply(
        variables, xpad, lengths=jnp.array([64]), method=net.extract_embedding
    )
    # not exact (SAME padding) but must be close, and much closer than ignoring
    # the mask entirely
    nomask, _ = net.apply(variables, xpad, method=net.extract_embedding)
    err_masked = float(jnp.abs(got - ref).max())
    err_nomask = float(jnp.abs(nomask - ref).max())
    assert err_masked < err_nomask


def test_trains_via_audio_trainer_interface():
    import optax

    net = AudioResNet.from_config(OPTS)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 48, 24)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, 8))
    variables = net.init(jax.random.PRNGKey(0), x)
    from deeplip_tpu.losses.softmax import LMCL

    head = LMCL(num_classes=3)
    hvars = head.init(jax.random.PRNGKey(1), net.apply(variables, x), labels)
    params = {"m": variables["params"], "h": hvars["params"]}
    tx = optax.sgd(0.05, momentum=0.9)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt):
        def loss_fn(p):
            out, upd = net.apply(
                {"params": p["m"], "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss, _ = head.apply({"params": p["h"]}, out, labels)
            return loss, upd["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), stats2, opt2, loss

    stats = variables["batch_stats"]
    losses = []
    for _ in range(5):
        params, stats, opt, loss = step(params, stats, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
