"""Named-scope wall-clock timers.

TPU-native analog of parelag::TimeManager (used throughout the reference,
e.g. /root/reference/src/PDESampler.cpp:80-83, src/MLMC_Manager.cpp:72-77).
Timer values feed back into the MLMC algorithm as the per-level cost model
when cost_model == "walltime" (reference: src/MLMC_Manager.cpp:367-383).

Note on JAX: device execution is asynchronous, so any timer that is supposed
to measure device work must wrap the timed region so that result arrays are
block_until_ready()-ed before the timer stops. The `timed` context manager
takes an optional `block` pytree for this.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from contextlib import contextmanager
from typing import Dict


class _Watch:
    __slots__ = ("elapsed", "count", "last")

    def __init__(self) -> None:
        self.elapsed = 0.0
        self.count = 0
        self.last = 0.0


class TimeManager:
    """Process-global registry of named accumulating timers."""

    _watches: Dict[str, _Watch] = OrderedDict()

    @classmethod
    def reset(cls) -> None:
        cls._watches = OrderedDict()

    @classmethod
    def get_watch(cls, name: str) -> _Watch:
        if name not in cls._watches:
            cls._watches[name] = _Watch()
        return cls._watches[name]

    @classmethod
    def elapsed(cls, name: str) -> float:
        """Total accumulated seconds for timer `name` (0.0 if never used)."""
        w = cls._watches.get(name)
        return w.elapsed if w is not None else 0.0

    @classmethod
    def last(cls, name: str) -> float:
        """Seconds of the most recent timed region for `name` (0.0 if unused)."""
        w = cls._watches.get(name)
        return w.last if w is not None else 0.0

    @classmethod
    @contextmanager
    def timed(cls, name: str, block=None):
        """Context manager accumulating wall time into timer `name`.

        If `block` is a callable it is invoked on exit and its return value
        is block_until_ready()-ed (when possible) before the timer stops, so
        asynchronous device work is included in the measurement.
        """
        w = cls.get_watch(name)
        t0 = time.perf_counter()
        try:
            yield w
        finally:
            if block is not None:
                out = block() if callable(block) else block
                _block_until_ready(out)
            w.last = time.perf_counter() - t0
            w.elapsed += w.last
            w.count += 1

    @classmethod
    def print_table(cls, stream=None) -> str:
        lines = ["%-60s %12s %8s" % ("Timer", "seconds", "calls")]
        lines.append("-" * 82)
        for name, w in cls._watches.items():
            lines.append("%-60s %12.6f %8d" % (name, w.elapsed, w.count))
        out = "\n".join(lines)
        if stream is not None:
            print(out, file=stream)
        return out


def _block_until_ready(tree) -> None:
    try:
        import jax

        jax.block_until_ready(tree)
    except Exception:
        pass
