"""Tests for the TDNN x-vector model, pooling zoo, and classification losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplip_tpu.models.tdnn import SpeakerEmbNet, context_to_kernel
from deeplip_tpu.models.pooling import MeanStdPooling, AttentiveStatPooling, MonoHeadAttention
from deeplip_tpu.losses.softmax import LMCL, CrossEntropyHead, AAMSoftmax, ASoftmax, softmax_cross_entropy
from deeplip_tpu.losses import triplet as T

ETDNN_OPTS = {
    "arch": "etdnn",
    "etdnn": {
        "input_dim": 24,
        "hidden_dim": [64, 64, 64, 64, 64, 64, 64, 64, 64, 128],
        "context": [[-2, -1, 0, 1, 2], [0], [-2, 0, 2], [0], [-3, 0, 3], [0], [-4, 0, 4], [0], [0], [0]],
        "tdnn_layers": 10,
        "embedding_dim": 32,
        "pooling": "statistic",
        "attention_hidden_size": 16,
        "bn_first": True,
    },
}


def test_context_to_kernel():
    assert context_to_kernel([-2, -1, 0, 1, 2]) == (5, 1)
    assert context_to_kernel([-2, 0, 2]) == (3, 2)
    assert context_to_kernel([-3, 0, 3]) == (3, 3)
    assert context_to_kernel([-4, 0, 4]) == (3, 4)
    assert context_to_kernel([0]) == (1, 1)


def test_speaker_emb_net_shapes_and_receptive_field():
    net = SpeakerEmbNet.from_config(ETDNN_OPTS)
    assert net.receptive_field == 23
    x = jnp.ones((2, 100, 24))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 32)
    xv, xa = net.apply(variables, x, method=net.extract_embedding)
    assert xv.shape == (2, 32) and xa.shape == (2, 32)


def test_padded_batch_matches_unpadded():
    """VALID convs + masked pooling: padding must not change eval outputs."""
    net = SpeakerEmbNet.from_config(ETDNN_OPTS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 100, 24)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    ref, _ = net.apply(variables, x, method=net.extract_embedding)
    xpad = jnp.concatenate([x, jnp.zeros((1, 40, 24))], axis=1)
    got, _ = net.apply(
        variables, xpad, lengths=jnp.array([100]), method=net.extract_embedding
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_meanstd_pooling_unbiased():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 50, 8)).astype(np.float32)
    pool = MeanStdPooling()
    out = pool.apply({}, jnp.asarray(x))
    want = np.concatenate([x.mean(axis=1), x.std(axis=1, ddof=1)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


@pytest.mark.parametrize("cls", [AttentiveStatPooling, MonoHeadAttention])
def test_attention_pooling_masked_consistency(cls):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 30, 16)), jnp.float32)
    pool = cls(hidden_size=8)
    variables = pool.init(jax.random.PRNGKey(0), x)
    ref = pool.apply(variables, x)
    xpad = jnp.concatenate([x, jnp.zeros((2, 10, 16))], axis=1)
    got = pool.apply(variables, xpad, lengths=jnp.array([30, 30]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_cross_entropy_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 16)
    got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    )
    assert abs(got - want) < 1e-5


def test_lmcl_vs_torch_oracle():
    """LMCL parity vs an independent torch implementation of AM-Softmax:
    normalized cosine logits, additive target-class margin, scale s, CE,
    plus 1e-5 * ||W||_1 (semantics of models/audio_models/loss.py:43-51)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    emb = rng.standard_normal((8, 12)).astype(np.float32)
    w = rng.standard_normal((5, 12)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    s, m = 30.0, 0.2

    head = LMCL(num_classes=5, scale=s, init_margin=m)
    variables = {"params": {"weights": jnp.asarray(w)}}
    loss, logits = head.apply(variables, jnp.asarray(emb), jnp.asarray(labels))

    te = torch.nn.functional.normalize(torch.tensor(emb))
    tw = torch.nn.functional.normalize(torch.tensor(w))
    tcos = te @ tw.T
    marg = torch.zeros_like(tcos)
    marg.scatter_(1, torch.tensor(labels)[:, None], m)
    tloss = torch.nn.functional.cross_entropy(s * (tcos - marg), torch.tensor(labels))
    tloss = tloss + 1e-5 * torch.norm(torch.tensor(w), 1)
    np.testing.assert_allclose(np.asarray(logits), tcos.numpy(), atol=1e-5)
    assert abs(float(loss) - float(tloss)) < 1e-5


def test_lmcl_margin_override_changes_loss():
    head = LMCL(num_classes=4, scale=30.0, init_margin=0.2)
    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 6))
    variables = head.init(jax.random.PRNGKey(0), emb, labels)
    l1, _ = head.apply(variables, emb, labels, margin=0.0)
    l2, _ = head.apply(variables, emb, labels, margin=0.4)
    assert float(l2) > float(l1)


def test_aam_and_asoftmax_run_and_beat_random():
    rng = np.random.default_rng(6)
    emb = jnp.asarray(rng.standard_normal((10, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 10))
    for head in (AAMSoftmax(num_classes=4), ASoftmax(num_classes=4)):
        variables = head.init(jax.random.PRNGKey(0), emb, labels)
        loss, logits = head.apply(variables, emb, labels)
        assert np.isfinite(float(loss))
        assert logits.shape == (10, 4)


def test_batch_all_triplet_vs_bruteforce():
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((10, 6)).astype(np.float32)
    labels = rng.integers(0, 3, 10)
    margin = 0.2
    loss, count = T.batch_all_triplet_loss(jnp.asarray(emb), jnp.asarray(labels), margin)

    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = e @ e.T
    vals = []
    for a in range(10):
        for p in range(10):
            for n in range(10):
                if a != p and labels[a] == labels[p] and labels[a] != labels[n]:
                    vals.append(max(cos[a, n] - cos[a, p] + margin, 0.0))
    assert int(count) == len(vals)
    np.testing.assert_allclose(float(loss), np.mean(vals), atol=1e-5)


def test_batch_hard_triplet_positive():
    rng = np.random.default_rng(8)
    emb = jnp.asarray(rng.standard_normal((12, 6)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, 12))
    loss, count = T.batch_hard_triplet_loss(emb, labels, 0.2)
    assert float(loss) >= 0 and int(count) >= 1


def test_training_decreases_lmcl_loss():
    """Few SGD steps on random data: loss must go down (sanity e2e of model+loss)."""
    import optax

    net = SpeakerEmbNet.from_config(ETDNN_OPTS)
    head = LMCL(num_classes=4, scale=30.0, init_margin=0.2)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((16, 60, 24)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 16))

    mvars = net.init(jax.random.PRNGKey(0), x)
    emb0 = net.apply(mvars, x)
    hvars = head.init(jax.random.PRNGKey(1), emb0, labels)
    params = {"model": mvars["params"], "head": hvars["params"]}
    stats = mvars["batch_stats"]
    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            out, updates = net.apply(
                {"params": p["model"], "batch_stats": stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss, _ = head.apply({"params": p["head"]}, out, labels)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, opt_state, loss

    losses = []
    for _ in range(8):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_multihead_attentive_pooling():
    from deeplip_tpu.models.pooling import MultiHeadAttentivePooling

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((2, 30, 32)), jnp.float32)
    pool = MultiHeadAttentivePooling(num_heads=4, hidden_size=8)
    variables = pool.init(jax.random.PRNGKey(0), x)
    out = pool.apply(variables, x)
    assert out.shape == (2, 64)  # mean ++ std
    # masked consistency: padding must not change the result
    xpad = jnp.concatenate([x, jnp.zeros((2, 10, 32))], axis=1)
    got = pool.apply(variables, xpad, lengths=jnp.array([30, 30]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(out), atol=1e-5)


def test_compact_bilinear_pooling_gradients_flow():
    import optax

    from deeplip_tpu.models.fusion import CompactBilinearPooling

    cbp = CompactBilinearPooling(output_dim=64)
    rng = np.random.default_rng(11)
    e1 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    variables = cbp.init(jax.random.PRNGKey(0), e1, e2)

    def loss_fn(e1):
        out = cbp.apply(variables, e1, e2)
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(e1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_asoftmax_psi_decomposition_tpu_safe():
    """psi(theta) = sign*cos(m*theta) - 2k must be continuous and monotone
    decreasing in theta (SphereFace); the sign term is computed by parity
    select, not (-1.0)**k, which lowers to pow(-1, k) and NaNs on TPU."""
    m = 4
    theta = np.linspace(0, np.pi, 2001)
    k = np.floor(m * theta / np.pi)
    sign = 1.0 - 2.0 * np.mod(k, 2.0)
    psi = sign * np.cos(m * theta) - 2.0 * k
    np.testing.assert_allclose(sign, (-1.0) ** k)
    assert np.all(np.diff(psi) <= 1e-9)  # monotone non-increasing
    assert np.all(np.abs(np.diff(psi)) < 0.02)  # continuous (no jumps)


def test_asoftmax_and_aam_accept_reduction_none():
    """build_criterion exposes AAM/A-Softmax to the fusion trainer, which
    calls every criterion with reduction='none' (train/fusion.py)."""
    from deeplip_tpu.losses.softmax import build_criterion

    emb = jnp.asarray(np.random.default_rng(0).standard_normal((6, 16)),
                      jnp.float32)
    labels = jnp.asarray([0, 1, 2, 0, 1, 2])
    for name in ("AAM-Softmax", "A-Softmax"):
        crit = build_criterion(name, num_classes=4)
        variables = crit.init(jax.random.PRNGKey(0), emb, labels)
        loss, logits = crit.apply(variables, emb, labels, reduction="none")
        assert loss.shape == (6,)
        assert np.isfinite(np.asarray(loss)).all()


def test_precision_plan_param_compat():
    """Every precision plan (incl. wsplit2's WeightSplitConv) must keep the
    exact param/batch-stats tree of the default model — checkpoints and the
    torch importer are plan-independent — and agree numerically on CPU
    (where every matmul precision is exact f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplip_tpu.models.tdnn import SpeakerEmbNet

    kw = dict(contexts=((-2, -1, 0, 1, 2), (0,)), hidden_dims=(16, 32),
              embedding_dim=8)
    base = SpeakerEmbNet(**kw)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 30, 24)),
                    jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(v, x)

    structure = jax.tree_util.tree_structure(v)
    for plan, tol in [(dict(conv_precision="default", fc_precision="high"),
                       1e-5),
                      (dict(conv_precision="wsplit2", fc_precision="highest"),
                       0.05),
                      (dict(conv_precision=("asplit2", "default")), 0.05)]:
        m = SpeakerEmbNet(**kw, **plan)
        v2 = m.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v2) == structure
        # same params -> same function. On CPU plain precisions compute
        # exact f32; the split modes genuinely round operands to bf16
        # (they emulate the MXU), so they only get a coarse bound here —
        # their accuracy is measured on the TPU (precision_budget.py)
        out = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=tol)


def test_comp_matmul_wsplit2_close():
    import jax.numpy as jnp
    import numpy as np

    from deeplip_tpu.ops.precision import comp_matmul, split_bf16

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    hi, lo = split_bf16(m)
    # hi is exactly bf16-representable and hi+lo reconstructs m exactly
    np.testing.assert_array_equal(
        np.asarray(hi), np.asarray(hi.astype(jnp.bfloat16).astype(jnp.float32)))
    np.testing.assert_allclose(np.asarray(hi + lo), np.asarray(m), rtol=0)
    out = comp_matmul(x, m, "wsplit2")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x @ m), atol=1e-5)
