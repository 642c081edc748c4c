#!/usr/bin/env python
"""On-chip DTW kernel parameter sweep (dev tool, run manually on the TPU).

Measures pipelined steady-state pairs/s of dtw_batch_pallas at the benchmark
shape (S=128, d=16, band=16) for a grid of pair_block sizes, on the same
scan-class-partitioned mixed batch bench.py uses.  One TPU process only
(CLAUDE.md: never run two concurrently).

Usage:
  python tools/kernel_sweep.py [PB ...]          # S=128 square kernel sweep
  python tools/kernel_sweep.py --long [S ...]    # stripe kernel at S=256..2048
"""

from __future__ import annotations

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


def long_sweep(seq_lens: list[int]) -> int:
    """Stripe kernel vs the square/jnp fallbacks at long banded lengths."""
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        MAX_KERNEL_SEQ_LEN,
        dtw_batch_pallas,
        stripe_width,
    )

    rng = np.random.default_rng(0)
    for S in seq_lens:
        B = max(256, min(8192, (1 << 22) // S))  # bound gather memory
        lengths = rng.integers(S - 40, S + 1, B).astype(np.int32)
        a = jnp.asarray(rng.normal(0, 1, (B, S, LATENT_DIM)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 1, (B, S, LATENT_DIM)).astype(np.float32))
        la = jnp.asarray(lengths)
        lb = jnp.asarray(np.roll(lengths, 1))
        mld = 40
        assert stripe_width(S, BAND, True, mld) is not None

        def time_one(name, fn):
            t0 = time.perf_counter()
            np.asarray(fn())
            log(f"S={S} {name}: compile+warm {time.perf_counter() - t0:.1f}s")
            for o in [fn() for _ in range(2)]:
                np.asarray(o)
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn() for _ in range(3)]
                for o in outs:
                    np.asarray(o)
                best = max(best, B * 3 / (time.perf_counter() - t0))
            log(f"S={S} {name}: {best:,.0f} pairs/s")
            return best

        from audio_pattern_discovery_tpu.ops.dtw_pallas import (
            _STRIPE_PANEL_ROWS,
            _stripe_pair_block,
        )

        pb0 = _stripe_pair_block(S, stripe_width(S, BAND, True, mld),
                                 min(_STRIPE_PANEL_ROWS, S))
        best = 0.0
        for pb in (pb0, 2 * pb0, 4 * pb0):
            rate = time_one(f"stripe PB={pb}", lambda pb=pb: dtw_batch_pallas(
                a, b, la, lb, band=BAND, normalize="path_len",
                max_len_diff=mld, pair_block=pb))
            best = max(best, rate)
        if S <= MAX_KERNEL_SEQ_LEN:
            square = time_one("square", lambda: dtw_batch_pallas(
                a, b, la, lb, band=BAND, normalize="path_len"))
            log(f"S={S}: stripe/square = {best / square:.2f}x")
    return 0


def main() -> int:
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_batch_pallas,
        scan_len_diff_classes,
    )

    if len(sys.argv) > 1 and sys.argv[1] == "--long":
        return long_sweep([int(x) for x in sys.argv[2:]] or [256, 512, 1024, 2048])

    pbs = [int(x) for x in sys.argv[1:]] or [128, 256, 512]

    rng = np.random.default_rng(0)
    lengths_np = rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32)
    a_np = rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32)
    b_np = rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32)
    la_np = lengths_np
    lb_np = np.roll(lengths_np, 1)

    classes = scan_len_diff_classes(SEQ_LEN, BAND, True)
    dd = np.abs(la_np - lb_np)
    cls = np.searchsorted(np.asarray(classes), dd)
    parts = []
    for c, bound in enumerate(classes):
        idx = np.nonzero(cls == c)[0]
        if len(idx):
            parts.append(
                (
                    int(bound),
                    jnp.asarray(a_np[idx]),
                    jnp.asarray(b_np[idx]),
                    jnp.asarray(la_np[idx]),
                    jnp.asarray(lb_np[idx]),
                )
            )
    log("classes: " + ", ".join(f"dd<={b}: {p[3].shape[0]}" for (b, *p) in parts))

    for pb in pbs:
        def run():
            return [
                dtw_batch_pallas(
                    pa, pb_, pla, plb, band=BAND, normalize="path_len",
                    max_len_diff=bound, pair_block=pb,
                )
                for bound, pa, pb_, pla, plb in parts
            ]

        def drain(outs):
            for o in outs:
                np.asarray(o)

        t0 = time.perf_counter()
        drain(run())
        log(f"PB={pb}: compile+warm {time.perf_counter() - t0:.1f}s")
        for o in [run() for _ in range(DEPTH)]:
            drain(o)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(ITERS)]
            for o in outs:
                drain(o)
            windows.append(BATCH * ITERS / (time.perf_counter() - t0))
        log(
            f"PB={pb}: " + ", ".join(f"{w:,.0f}" for w in windows)
            + f" pairs/s (best {max(windows):,.0f})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
