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
