"""LMCL criterion and LowFER fusion-head weight import round-trips."""

import numpy as np
import jax.numpy as jnp
import pytest

from deeplip_tpu.interop.torch_import import import_lmcl_state_dict
from deeplip_tpu.losses.softmax import LMCL
from deeplip_tpu.models.fusion import LowFER


def test_lmcl_weight_import():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((5, 12)).astype(np.float32)
    params = import_lmcl_state_dict({"module.weights": w})
    head = LMCL(num_classes=5, scale=30.0, init_margin=0.2)
    emb = jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, 4))
    loss, logits = head.apply({"params": params}, emb, labels)
    # logits must equal normalized-cosine against the imported weights
    e = np.asarray(emb) / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(logits), e @ wn.T, atol=1e-5)


def test_lowfer_uv_import_roundtrip():
    """Reference LowFER U/V (LBP.py:12-15) slot into our param tree 1:1."""
    rng = np.random.default_rng(1)
    d, k, o = 8, 4, 6
    u = rng.uniform(-1, 1, (d, k * o)).astype(np.float32)
    v = rng.uniform(-1, 1, (d, k * o)).astype(np.float32)
    head = LowFER(input_dims=(d, d), k=k, output_dim=o)
    params = {"params": {"U": jnp.asarray(u), "V": jnp.asarray(v)}}
    e1 = jnp.asarray(rng.standard_normal((3, d)), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal((3, d)), jnp.float32)
    mfb = np.asarray(head.apply(params, e1, e2, method=head.mfb))
    # manual torch-semantics recompute: (e1 U ⊙ e2 V).view(-1, o, k).mean(-1), L2
    x = (np.asarray(e1) @ u) * (np.asarray(e2) @ v)
    x = x.reshape(3, o, k).mean(-1)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(mfb, x, atol=1e-5)
