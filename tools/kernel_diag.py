#!/usr/bin/env python
"""Isolate the DTW kernel regression: time variants in one TPU process.

Methodology matches bench.py: drain a warmup wave fully, then time windows
of ITERS pipelined dispatches, best of 3 windows.  Optionally A/Bs against
the round-1 kernel extracted to /tmp/dtw_pallas_old.py.
"""

from __future__ import annotations

import importlib.util
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEQ_LEN = 128
LATENT_DIM = 16
BAND = 16
BATCH = 32_768
ITERS = 6
DEPTH = 4


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def load_old():
    p = Path("/tmp/dtw_pallas_old.py")
    if not p.exists():
        return None
    spec = importlib.util.spec_from_file_location("dtw_pallas_old", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_batch_pallas

    rng = np.random.default_rng(0)
    lengths_np = rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32)
    a = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    la = jnp.asarray(lengths_np)
    lb = jnp.asarray(np.roll(lengths_np, 1))
    lengths_nb = rng.integers(SEQ_LEN - 16, SEQ_LEN + 1, BATCH).astype(np.int32)
    la_nb = jnp.asarray(lengths_nb)
    lb_nb = jnp.asarray(np.roll(lengths_nb, 1))

    def timeit(name, fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        log(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
        for o in [fn() for _ in range(DEPTH)]:
            np.asarray(o)  # drain warmup wave completely
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(ITERS)]
            for o in outs:
                np.asarray(o)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        log(f"{name}: {best:,.0f} pairs/s (best of 3)")

    old = load_old()
    if old is not None:
        timeit("OLD-mixed", lambda: old.dtw_batch_pallas(
            a, b, la, lb, band=BAND, normalize="path_len"))
    # (a) masked 7-step scan, fused mask build (mld=None => old-style plan).
    timeit("masked7-mixed", lambda: dtw_batch_pallas(
        a, b, la, lb, band=BAND, normalize="path_len"))
    # (b) seam-free 6-step scan, whole batch in one class.
    timeit("seamfree6-narrow", lambda: dtw_batch_pallas(
        a, b, la_nb, lb_nb, band=BAND, normalize="path_len", max_len_diff=31))
    if old is not None:
        timeit("OLD-narrow", lambda: old.dtw_batch_pallas(
            a, b, la_nb, lb_nb, band=BAND, normalize="path_len"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
