"""Structured metrics logging (SURVEY.md §5 "Metrics/logging").

The reference prints loss scalars and dumps PNG grids. Here: a tiny
dependency-free writer that appends one CSV row per step and mirrors to
stdout every ``print_every`` steps (opt-in TensorBoard scalars via
``tensorboard=True`` — importing tensorflow costs ~15s, so off by default); the attention-grid image dumps live in
``objgan_tpu/utils/visualize.py`` (they are the model family's main
debugging tool and are kept).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Mapping


class MetricsWriter:
    def __init__(self, directory: str, name: str = "train",
                 print_every: int = 50, tensorboard: bool = False):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{name}_metrics.csv")
        self.print_every = print_every
        self._file = None
        self._writer = None
        self._fields = None
        self._t0 = time.monotonic()
        self._tb = None
        if tensorboard:
            try:  # tensorflow is optional; CSV always works
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(directory, "tb", name)
                )
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Mapping[str, float]) -> None:
        row = {"step": step, "wall_s": round(time.monotonic() - self._t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._writer is None:
            self._fields = list(row)
            if os.path.exists(self.path) and os.path.getsize(self.path):
                # resume-append: the existing file's header IS the schema —
                # writing this run's key order under the old header would
                # silently misalign columns if a code change added/reordered
                # metrics. Unknown-to-old-header keys are dropped from the
                # CSV (with one loud notice) rather than corrupting it.
                with open(self.path, newline="") as f:
                    existing = next(csv.reader(f), None)
                if existing:
                    dropped = [k for k in row if k not in existing]
                    if dropped:
                        print(f"NOTE: resuming {self.path} with its "
                              f"existing CSV schema; new metric keys "
                              f"{dropped} are not recorded in the CSV "
                              "(start a fresh file to include them)",
                              flush=True)
                    self._fields = existing
            self._file = open(self.path, "a", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=self._fields)
            if self._file.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow({k: row.get(k, "") for k in self._fields})
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
        # print/flush cadence keys off steps SINCE THE LAST PRINT, not step
        # divisibility: _run_loop writes rows at ~K*ceil(50/K)-step strides,
        # and `step % print_every == 0` almost never hits such a stride (a
        # 56-step stride meets a multiple of 100 every 1400 steps) — which
        # once silenced all training output past step 400 while checkpoints
        # kept landing. Rows are already throttled by the caller; the CSV is
        # flushed every row so progress is always observable on disk.
        self._file.flush()
        last = getattr(self, "_last_printed", None)
        if last is None or step - last >= self.print_every:
            self._last_printed = step
            parts = " ".join(f"{k}={float(v):.4g}" for k, v in metrics.items())
            print(f"[step {step}] {parts}", flush=True)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
            self._writer = None
        if self._tb is not None:
            # unflushed tf.summary buffers would drop the tail of the run
            self._tb.flush()
            self._tb.close()
            self._tb = None
