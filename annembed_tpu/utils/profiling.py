"""Phase timing + optional device tracing.

The reference instruments every phase with cpu_time::ProcessTime +
SystemTime pairs (embedder.rs:871-884, hubness.rs:42-73) and
memory-stats probes.  TPU equivalent: wall timers around
block_until_ready boundaries plus optional ``jax.profiler`` traces
(SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class PhaseTimer:
    """Collects named phase wall times; ``timings`` maps name -> s."""

    def __init__(self) -> None:
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase.  Arrays to block on can be passed either via
        ``sync=`` directly or by appending to the yielded list — both
        are honored (the dead ``sync=`` parameter previously recorded
        dispatch-only timings for callers who used it)."""
        t0 = time.perf_counter()
        out = [] if sync is None else [sync]
        try:
            yield out
        finally:
            if out:
                try:
                    import jax
                    for leaf in jax.tree_util.tree_leaves(out):
                        if hasattr(leaf, "block_until_ready"):
                            leaf.block_until_ready()
                except Exception:  # pragma: no cover
                    pass
            dt = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            logger.info("phase %s: %.3fs", name, dt)

    def summary(self) -> Dict[str, float]:
        out = dict(self.timings)
        out["total"] = sum(self.timings.values())
        return out


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace into ``logdir`` (no-op if None).
    View with tensorboard / xprof."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", logdir)
