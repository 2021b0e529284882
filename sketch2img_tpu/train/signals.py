"""Checkpoint-on-signal (SURVEY.md §5 failure detection/recovery plan).

The reference trainer saves only per epoch (/root/reference/trainer.py:273-279)
— a preempted run loses up to an epoch of work. Here a SIGTERM/SIGINT (the
preemption notice on TPU pods and most schedulers) sets a flag; the training
loop observes it at the next step boundary, flushes one final checkpoint and
exits cleanly. Handlers only flag — all saving happens on the main thread at
a safe point (never inside a traced/async dispatch).
"""

from __future__ import annotations

import signal
from typing import Callable, Iterable, Optional


class GracefulShutdown:
    """Context manager: install handlers that record a shutdown request.

    Usage::

        with GracefulShutdown() as stop:
            for batch in loader:
                ...
                if stop.requested:
                    save_checkpoint(...)
                    break

    A second signal while shutdown is pending re-raises the default
    behavior (so a stuck save can still be killed).
    """

    def __init__(
        self,
        signals: Iterable[int] = (signal.SIGTERM, signal.SIGINT),
        on_signal: Optional[Callable[[int], None]] = None,
    ):
        self._signals = tuple(signals)
        self._on_signal = on_signal
        self._previous = {}
        self.requested = False
        self.signum: Optional[int] = None

    def _handler(self, signum, frame):
        if self.requested:  # second signal: restore + re-raise default
            signal.signal(signum, self._previous.get(signum, signal.SIG_DFL))
            signal.raise_signal(signum)
            return
        self.requested = True
        self.signum = signum
        if self._on_signal is not None:
            self._on_signal(signum)

    def __enter__(self) -> "GracefulShutdown":
        for s in self._signals:
            self._previous[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()
        return False
