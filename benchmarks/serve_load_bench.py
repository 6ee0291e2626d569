"""Serving under load: throughput-at-latency with and without micro-batching.

VERDICT r4 #8: ``benchmarks/serve_bench.py`` measured single-call latency;
this bench measures the serving surface under OFFERED LOAD — N concurrent
closed-loop clients issuing ``verify`` calls back-to-back — comparing the
direct per-call path (one embedding dispatch per request) against
:class:`deeplip_tpu.serve.MicroBatcher` (requests arriving within one wait
window coalesce into a single bucketed extraction dispatch).

Rig-vs-production framing (same as BENCH.md everywhere): on this dev rig a
dispatch round-trip through the stdio relay costs ~30-60 ms, so the direct
path's throughput ceiling is ~1/RTT regardless of concurrency, while the
batched path amortizes one RTT over the whole coalesced batch. On a
production PCIe host the dispatch is ~1 ms and the same arithmetic applies
at 30-60× smaller constants; ``dispatches_per_request`` is reported so the
PCIe expectation is arithmetic, not extrapolation.

Run (TPU):   python benchmarks/serve_load_bench.py --out docs/serve_load_r05.json
Smoke (CPU): PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/serve_load_bench.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def _closed_loop(call, probes, concurrency: int, total_requests: int):
    """N closed-loop clients round-robin over ``probes``; returns
    (per-request latencies, wall seconds)."""
    latencies: list[float] = []
    lock = threading.Lock()
    it = iter(range(total_requests))

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                return
            probe = probes[i % len(probes)]
            t0 = time.perf_counter()
            call(probe)
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return latencies, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + tiny loads (CPU CI smoke)")
    ap.add_argument("--max-wait-ms", type=float, default=20.0,
                    help="MicroBatcher coalescing window (default sized to "
                    "this rig's ~30-60 ms dispatch RTT; use ~2 ms on PCIe)")
    ap.add_argument("--levels", default=None,
                    help="comma-separated microbatch concurrency levels")
    ap.add_argument("--direct-levels", default=None,
                    help="comma-separated direct-mode concurrency levels")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _train_config
    from deeplip_tpu.serve import MicroBatcher, SpeakerVerifier

    rate = 16000
    utt_sec = 1.0 if args.smoke else 3.0
    max_batch = 8 if args.smoke else 64
    levels = [1, 2, 4] if args.smoke else [1, 4, 16, 64]
    direct_levels = [1] if args.smoke else [1, 4, 16, 64]
    if args.levels is not None:
        levels = [int(x) for x in args.levels.split(",") if x]
    if args.direct_levels is not None:
        direct_levels = [int(x) for x in args.direct_levels.split(",") if x]

    cfg = _train_config(bs=8)
    if args.smoke:
        cfg.model["etdnn"]["hidden_dim"] = [32] * 9 + [64]
        cfg.model["etdnn"]["embedding_dim"] = 16
    cfg.train["n_spk"] = 1
    v = SpeakerVerifier(cfg)

    rng = np.random.default_rng(0)
    probes = [(0.1 * rng.standard_normal(int(utt_sec * rate))).astype(np.float32)
              for _ in range(16)]
    v.enroll("target", probes[0])
    v.threshold = 0.5

    report = {
        "rig": "cpu-smoke" if args.smoke else "stdio-relay tunnel",
        "utt_seconds": utt_sec,
        "max_batch": max_batch,
        "max_wait_ms": args.max_wait_ms,
        "rows": [],
    }

    # -- warm-up: compile every pow2 row-count shape the batcher can emit
    # (fixed-quantization bucket; one length bucket since probes share a
    # duration), absorb the relay first-transfer stall
    rows = 1
    while rows <= max_batch:
        v.embed_pcm({f"w{i}": probes[i % len(probes)] for i in range(rows)},
                    set_overrides={"n_buckets": 0})
        rows *= 2

    # -- direct path: one embedding dispatch per request --------------------
    for n in direct_levels:
        total = max(12, 4 * n) if args.smoke else max(24, 8 * n)
        lat, wall = _closed_loop(
            lambda p: v.verify("target", p), probes, n, total)
        report["rows"].append({
            "mode": "direct", "concurrency": n, "n_requests": total,
            "throughput_rps": round(total / wall, 2),
            "p50_ms": round(_pct(lat, 50) * 1e3, 1),
            "p95_ms": round(_pct(lat, 95) * 1e3, 1),
            "dispatches_per_request": 1.0,
        })

    # -- micro-batched path --------------------------------------------------
    for n in levels:
        mb = MicroBatcher(v, max_batch=max_batch,
                          max_wait_ms=args.max_wait_ms)
        try:
            total = max(12, 4 * n) if args.smoke else max(24, 8 * n)
            lat, wall = _closed_loop(
                lambda p: mb.verify("target", p), probes, n, total)
            report["rows"].append({
                "mode": "microbatch", "concurrency": n, "n_requests": total,
                "throughput_rps": round(total / wall, 2),
                "p50_ms": round(_pct(lat, 50) * 1e3, 1),
                "p95_ms": round(_pct(lat, 95) * 1e3, 1),
                "mean_batch_slots": round(mb.mean_batch_slots, 2),
                "dispatches_per_request": round(
                    mb.n_batches / max(mb.n_requests, 1), 3),
            })
        finally:
            mb.close()

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
