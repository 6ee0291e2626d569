"""Data-prep script, feature backend dispatch, schedules, misc coverage."""

import os
import subprocess
import pytest
import sys

import jax.numpy as jnp
import numpy as np

from deeplip_tpu.data.manifest import SpeakerManifest
from deeplip_tpu.data.synthetic import make_audio_corpus
from deeplip_tpu.ops import features as F
from deeplip_tpu.train.schedules import cosine_annealing_schedule, multistep_schedule


def test_prepare_audio_script(tmp_path):
    root = str(tmp_path / "wav")
    make_audio_corpus(root, n_spk=2, utts_per_spk=2, duration=0.5)
    # remove the generated manifest; the script must rebuild one
    os.remove(os.path.join(root, "manifest.csv"))
    out = str(tmp_path / "m.csv")
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    res = subprocess.run(
        [sys.executable, "scripts/prepare_data.py", "audio", "--root", root, "--out", out],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    m = SpeakerManifest.load(out)
    assert m.n_spk == 2 and m.n_utts == 4


def test_feature_backend_pallas_dispatch():
    """backend='pallas' must agree with the default path (interpret-safe on
    CPU because the Pallas call compiles through the CPU interpreter? No —
    only interpret mode runs on CPU, so just check the xla backend remains
    default and pallas dispatch exists and is callable in interpret mode."""
    cfg = F.FeatureConfig(feat_type="mfcc", normalize=True)
    sig = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)), jnp.float32)
    base = F.extract_features(sig, cfg, backend="xla")
    from deeplip_tpu.ops.pallas.fbank_kernel import pallas_audio_features

    raw = F.FeatureConfig(feat_type="mfcc", normalize=False)
    via_kernel = pallas_audio_features(sig, raw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(F.cmvn(via_kernel)), np.asarray(base), atol=2e-4, rtol=1e-3
    )


def test_multistep_schedule_boundaries():
    sched = multistep_schedule(0.1, [2, 4], 0.1, steps_per_epoch=10)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert abs(float(sched(19)) - 0.1) < 1e-6
    assert abs(float(sched(20)) - 0.01) < 1e-6
    assert abs(float(sched(40)) - 0.001) < 1e-6


def test_cosine_schedule_matches_torch_formula():
    sched = cosine_annealing_schedule(3e-4, t_max=5)
    assert abs(float(sched(0)) - 3e-4) < 1e-6
    assert float(sched(5)) < 1e-6  # trough at T_max
    mid = float(sched(2.5))
    assert abs(mid - 1.5e-4) < 1e-6


def test_config_flatten_reference_semantics():
    from deeplip_tpu.core.config import Config

    cfg = Config(
        {
            "feat_type": "mfcc",
            "mfcc": {"num_cep": 24},
            "fbank": {"num_bin": 40},
            "rate": 16000,
        }
    )
    flat = cfg.flatten()
    assert flat["num_cep"] == 24          # selected subsection hoisted
    assert "num_bin" not in flat          # unselected subsection dropped
    assert flat["rate"] == 16000


def test_prefetcher_propagates_errors():
    from deeplip_tpu.data.prefetch import ThreadedPrefetcher

    def producer(i):
        if i == 3:
            raise ValueError("boom")
        return i * 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        list(ThreadedPrefetcher(range(6), producer, num_workers=2))


def test_prefetcher_preserves_order():
    import time as _time

    from deeplip_tpu.data.prefetch import ThreadedPrefetcher

    def producer(i):
        _time.sleep(0.01 * ((i * 7) % 3))  # jitter completion order
        return i

    out = list(ThreadedPrefetcher(range(20), producer, num_workers=4))
    assert out == list(range(20))


def test_stft_feature_type_through_model():
    """feat_type=stft (257-dim) flows through the TDNN stack."""
    import jax

    from deeplip_tpu.models.tdnn import SpeakerEmbNet

    cfg = F.FeatureConfig(feat_type="stft", normalize=True)
    assert F.feature_dim(cfg) == 257
    sig = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)), jnp.float32)
    feats = F.extract_features(sig, cfg)
    net = SpeakerEmbNet(
        contexts=((-2, -1, 0, 1, 2), (0,)), hidden_dims=(32, 64), embedding_dim=16
    )
    variables = net.init(jax.random.PRNGKey(0), feats)
    out = net.apply(variables, feats)
    assert out.shape == (2, 16)


def test_make_mesh_multi_axis():
    """Mesh helper supports (data, model) layouts for future TP/PP."""
    import jax

    from deeplip_tpu.core.mesh import data_sharding, make_mesh

    mesh = make_mesh([("data", 4), ("model", 2)])
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    # -1 wildcard fills remaining devices
    mesh2 = make_mesh([("data", -1), ("model", 2)])
    assert mesh2.devices.shape == (4, 2)
    s = data_sharding(mesh, ndim=2)
    assert s.spec == jax.sharding.PartitionSpec("data", None)


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from deeplip_tpu.train.metrics import profile_trace

    with profile_trace(None):
        pass
    logdir = str(tmp_path / "trace")
    with profile_trace(logdir):
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert os.path.isdir(logdir)


def test_tb_event_writer_readable_by_real_tensorboard(tmp_path):
    """The hand-encoded event file must parse with the REAL tensorboard
    reader (installed in this env) and round-trip the scalar values."""
    pytest.importorskip("tensorboard")
    from deeplip_tpu.train.metrics import StepLogger

    logger = StepLogger(str(tmp_path / "exp"), print_every=0, prefix="train")
    logger.log(1, examples=8, loss=2.5, acc=0.25)
    logger.log(2, examples=8, loss=1.25, acc=0.5)
    logger.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "exp" / "tb"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/loss", "train/acc"} <= tags, tags
    losses = {e.step: e.value for e in acc.Scalars("train/loss")}
    assert losses[1] == pytest.approx(2.5) and losses[2] == pytest.approx(1.25)
    accs = {e.step: e.value for e in acc.Scalars("train/acc")}
    assert accs[2] == pytest.approx(0.5)


def test_parity_check_trained_net(tmp_path):
    """End-to-end parity harness with a TRAINED torch reference net.

    Round 1 ran this only with untrained (embedding-collapsed) nets, which
    masked a real eval-path bug (padded-PCM pre-emphasis leak, ~1e-3 on
    trained weights). Trained weights make the bar meaningful: embeddings
    ≤1e-4 and bit-equal EER.
    """
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report = tmp_path / "report.json"
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "parity_check.py"),
         "--selftest", "--arch", "tdnn", "--n-spk", "4", "--utts-per-spk", "4",
         "--n-trials", "200", "--train-steps", "25", "--device", "cpu",
         "--report", str(report)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(report.read_text())
    assert rep["embedding_parity_bar_1e-4"], rep
    assert rep["eer_bit_equal"], rep


def test_pyproject_entry_points_resolve():
    """Packaging metadata: every console script target must import and be
    callable, and the dynamic version attr must exist (pyproject.toml)."""
    import importlib
    import tomllib

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    for target in meta["project"]["scripts"].values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target
    attr = meta["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    pkg, name = attr.rsplit(".", 1)
    assert isinstance(getattr(importlib.import_module(pkg), name), str)
