"""Regression guards for the driver contracts (__graft_entry__, bench.py)."""

import os
import subprocess
import sys

import jax
import numpy as np


def test_graft_entry_and_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 512)
    assert np.all(np.isfinite(np.asarray(out)))
    g.dryrun_multichip(2)


def test_dryrun_multichip_8_from_driverlike_env(tmp_path):
    """Round-1 regression: the driver calls ``dryrun_multichip(8)`` in a
    process whose sitecustomize already initialized JAX with ONE device
    (MULTICHIP_r01.json: ``mesh needs 8 devices, have 1``). Reproduce that
    shape here: a sitecustomize on PYTHONPATH initializes a 1-device JAX at
    interpreter startup, and no force_host flag is set — dryrun_multichip(8)
    must still succeed (via its scrubbed-subprocess fallback).
    """
    (tmp_path / "sitecustomize.py").write_text(
        "import jax\njax.devices()  # pin a 1-device backend at startup\n"
    )
    env = dict(
        os.environ,
        PYTHONPATH=str(tmp_path),
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS="",  # no virtual-device escape hatch in the outer process
    )
    code = (
        "import jax, sys; assert len(jax.devices()) == 1, jax.devices(); "
        "sys.path.insert(0, '/root/repo'); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-4000:])
    assert "dryrun_multichip(8)" in res.stdout and "OK" in res.stdout


def test_bench_smoke_subprocess():
    """bench.py runs end-to-end (tiny shapes) and prints the JSON contract."""
    import json

    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu", BENCH_SMOKE="1")
    res = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, env=env, cwd="/root/repo", timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    record = json.loads(line)
    assert record["metric"] == "verification_trials_per_sec"
    assert record["unit"] == "trials/sec"
    assert record["value"] > 0 and record["vs_baseline"] > 0

def test_bench_ragged_profile_smoke():
    """BENCH_PROFILE=ragged drives the shipping bucketed extractor
    (EvalUtteranceSet -> extract_embeddings) and reports pad-waste."""
    import json

    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu", BENCH_SMOKE="1",
               BENCH_PROFILE="ragged", DEEPLIP_BENCH_INNER="1")
    res = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, env=env, cwd="/root/repo", timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    record = json.loads(res.stdout.strip().splitlines()[-1])
    assert record["profile"] == "ragged"
    assert record["value"] > 0 and record["vs_baseline"] > 0
    assert 0 < record["pad_waste"] < 1
    assert record["n_batch_shapes"] >= 2  # the corpus is genuinely ragged
    assert np.isfinite(record["eer"])


def test_bench_supervisor_retries_transient_failure(monkeypatch):
    """The bench supervisor retries a failed attempt in a fresh subprocess
    and prints only the final JSON line once an attempt succeeds (r3: two
    back-to-back driver-style bench runs died on transient tunnel-init
    failures that a retry would have absorbed)."""
    import importlib.util
    import io
    import json
    import types

    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    calls = []

    def fake_run(cmd, env=None, timeout=None, **kwargs):
        # accepts the supervisor's real kwargs (stdout=PIPE, text,
        # preexec_fn) loosely so signature drift can't silently break it
        calls.append(cmd)
        if len(calls) < 3:  # two transient tunnel failures...
            return types.SimpleNamespace(returncode=1, stdout="")
        return types.SimpleNamespace(  # ...then a clean measurement
            returncode=0,
            stdout='warmup noise\n{"metric": "verification_trials_per_sec",'
                   ' "value": 42.0, "unit": "trials/sec", "vs_baseline": 1.0}\n')

    sleeps = []
    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)

    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    rc = bench._supervise()
    monkeypatch.undo()

    assert rc == 0 and len(calls) == 3
    assert sleeps == [60, 240]  # backoff before attempts 2 and 3
    record = json.loads(out.getvalue().strip())
    assert record["metric"] == "verification_trials_per_sec"
    assert record["value"] == 42.0
