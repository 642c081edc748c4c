"""block_until_ready-bracketed device timing (SURVEY.md SS6.1).

TPU dispatch is async; wall-clock timing of a jitted call without a
synchronization barrier measures dispatch latency, not compute.  DeviceTimer
synchronizes on entry and blocks on the produced arrays at exit.
"""

from __future__ import annotations

import time

import jax


class DeviceTimer:
    """Usage:
        with DeviceTimer() as t:
            out = fn(x)
            t.block_on(out)
        elapsed = t.elapsed_s
    """

    def __enter__(self) -> "DeviceTimer":
        # Drain any previously enqueued work so we time only our region.
        jax.effects_barrier()
        self._outputs = []
        self.t0 = time.perf_counter()
        return self

    def block_on(self, *outputs) -> None:
        self._outputs.extend(outputs)

    def __exit__(self, *exc) -> bool:
        for out in self._outputs:
            jax.block_until_ready(out)
        self.elapsed_s = time.perf_counter() - self.t0
        return False


def time_fn(fn, *args, warmup: int = 1, iters: int = 3) -> float:
    """Median wall-seconds per call of `fn(*args)`, post-compilation."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
