"""Structured training metrics and profiling hooks.

The reference's observability is a tqdm bar plus an unused
``tensorboardX.SummaryWriter`` (SURVEY.md §5). Here every step can emit a
structured record (loss, accuracy, lr, steps/s, examples/s) to stdout and a
JSONL file under the exp dir, and :func:`profile_trace` wraps a region in a
``jax.profiler`` trace for TensorBoard's TPU profiler.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class StepLogger:
    def __init__(self, exp_dir: str | None = None, print_every: int = 10, prefix: str = "train",
                 tensorboard: bool = True):
        self.print_every = print_every
        self.prefix = prefix
        self._file = None
        self._tb = None
        if exp_dir:
            os.makedirs(exp_dir, exist_ok=True)
            self._file = open(os.path.join(exp_dir, f"{prefix}_metrics.jsonl"), "a")
            if tensorboard:
                # scalars visible via `tensorboard --logdir <exp_root>`
                # (closes the reference's dead SummaryWriter, train_video.py:25,78)
                from deeplip_tpu.train.tb_events import TBEventWriter

                self._tb = TBEventWriter(os.path.join(exp_dir, "tb"))
        self._t0 = time.perf_counter()
        self._last_time = self._t0
        self._last_step = 0
        self._last_printed: int | None = None

    def log(self, step: int, examples: int | None = None, **scalars) -> None:
        now = time.perf_counter()
        record = {"step": step, "time": now - self._t0}
        dt = now - self._last_time
        if dt > 0 and step > self._last_step:
            record["steps_per_sec"] = (step - self._last_step) / dt
            if examples is not None:
                record["examples_per_sec"] = examples * (step - self._last_step) / dt
        record.update({k: float(v) for k, v in scalars.items()})
        self._last_time = now
        self._last_step = step
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb is not None:
            self._tb.add_scalars(
                step,
                {f"{self.prefix}/{k}": v for k, v in record.items()
                 if k not in ("step", "time") and isinstance(v, float)},
            )
        # delta gate, not `step % print_every`: trainers that pre-gate their
        # log calls (or advance `step` by K under grouped stepping) would
        # otherwise skip the modulo forever and print nothing
        should_print = self.print_every and (
            self._last_printed is None
            or step - self._last_printed >= self.print_every
        )
        if should_print:
            self._last_printed = step
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
                if k != "time"
            )
            print(f"[{self.prefix}] {parts}", flush=True)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


class NanGuard:
    """Detects non-finite losses and counts consecutive occurrences.

    The reference's NaN handling is a commented-out recovery hack
    (``train_audio.py:189-195``); here non-finite steps raise after
    ``patience`` consecutive hits so checkpoint-resume can take over.
    """

    def __init__(self, patience: int = 3):
        self.patience = patience
        self.streak = 0

    def check(self, loss: float) -> bool:
        """Returns True if the step is usable; raises after `patience` bad steps."""
        import math

        if math.isfinite(loss):
            self.streak = 0
            return True
        self.streak += 1
        if self.streak >= self.patience:
            raise FloatingPointError(
                f"non-finite loss for {self.streak} consecutive steps"
            )
        return False


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
