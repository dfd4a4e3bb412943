"""Run monitor: callback registry + TensorBoard scalars + .npy log dumps.

Re-design of the reference ``Monitor`` (monitor.py:7-101): callbacks are
registered with a ``record_step`` period (monitor.py:66-69), scalar results go
to a tensorboardX ``SummaryWriter`` (monitor.py:17-33), and every callback's
accumulated results are flushed to ``{name}.logs.npy`` in the log directory
(monitor.py:50-55, :97-100).

Two deliberate deviations from the reference:
* the caller's ``step`` is honoured (the reference ignores it and uses an
  internal counter — monitor.py:84-88, SURVEY.md known-bugs item 11);
* tensorboardX is an optional dependency: without it the monitor still
  accumulates and dumps ``.npy`` logs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

try:  # pragma: no cover - exercised implicitly depending on environment
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


class Monitor:
    """Callback registry with scalar logging.

    Callbacks have signature ``callback(step, params) -> dict | None``;
    ``params`` is the live parameter pytree passed by the training loop
    (the reference's callbacks read live GPflow variables instead —
    optimize.py:285-364; a functional design must thread state explicitly).
    Returned scalar values are written to TensorBoard and accumulated for
    the ``.npy`` dump at :meth:`flush` / :meth:`close`.
    """

    def __init__(self, logdir: Optional[str] = None, use_tensorboard: bool = True):
        self.logdir = None if logdir is None else Path(logdir)
        if self.logdir is not None:
            self.logdir.mkdir(parents=True, exist_ok=True)
        self._writer = None
        if use_tensorboard and SummaryWriter is not None and self.logdir is not None:
            self._writer = SummaryWriter(logdir=str(self.logdir))
        self._callbacks: Dict[str, Callable] = {}
        self._record_steps: Dict[str, int] = {}
        self._logs: Dict[str, List[Dict]] = {}

    def add_callback(self, name: str, callback: Callable, record_step: int = 1) -> None:
        """Register ``callback`` to run every ``record_step`` steps
        (reference monitor.py:66-69)."""
        self._callbacks[name] = callback
        self._record_steps[name] = max(int(record_step), 1)
        self._logs.setdefault(name, [])

    def collect_logs(self) -> Dict[str, List[Dict]]:
        return dict(self._logs)

    def _handle_result(self, name: str, step: int, result) -> None:
        if not isinstance(result, dict):
            return
        entry = {"step": step}
        for key, value in result.items():
            value = np.asarray(value)
            entry[key] = value
            if self._writer is not None and value.ndim == 0:
                self._writer.add_scalar(f"{name}/{key}", float(value), global_step=step)
        self._logs[name].append(entry)

    def __call__(self, step: int, params=None, final: bool = False) -> None:
        """Run all callbacks due at ``step`` (``final=True`` forces all)."""
        for name, callback in self._callbacks.items():
            due = final or (step % self._record_steps[name] == 0)
            if not due:
                continue
            result = callback(step, params)
            self._handle_result(name, step, result)

    def add_scalar(self, tag: str, value, step: int) -> None:
        """Direct scalar write (used by trainers for loss/timing traces).

        Accumulated into the ``.npy`` logs as well — without tensorboardX
        these scalars previously vanished entirely, contradicting the
        module's hermetic-logging promise."""
        value = float(value)
        if self._writer is not None:
            self._writer.add_scalar(tag, value, global_step=step)
        name, _, key = tag.partition("/")
        self._logs.setdefault(name, []).append(
            {"step": step, key or "value": np.asarray(value)}
        )

    def flush(self) -> None:
        """Dump accumulated logs to ``{name}.logs.npy`` (monitor.py:50-55)."""
        if self.logdir is None:
            return
        for name, entries in self._logs.items():
            if not entries:
                continue
            path = self.logdir / f"{name}.logs.npy"
            np.save(str(path), np.asarray(entries, dtype=object), allow_pickle=True)
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        self.flush()
        if self._writer is not None:
            self._writer.close()
            self._writer = None
