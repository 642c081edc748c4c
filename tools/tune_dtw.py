#!/usr/bin/env python
"""On-chip tuning harness for the Pallas DTW kernel (run manually on TPU).

Separates three timings the tunneled backend conflates:
  1. RPC round-trip of a trivial jitted op (dispatch+materialize floor),
  2. per-call synchronized kernel time (what bench.py measured),
  3. pipelined throughput: enqueue K batches back-to-back, materialize at
     the end — the steady-state number a production driver sees.
Then sweeps pair_block to pick the default.
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SEQ_LEN = 128
LATENT_DIM = 16
BAND = 16
BATCH = 32_768
DEPTH = 4  # pipelined enqueue depth


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_batch_pallas

    dev = jax.devices()[0]
    log(f"device: {dev}")

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    la = jnp.asarray(rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32))
    lb = jnp.asarray(np.roll(np.asarray(la), 1))

    # 1. RPC floor
    tiny = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    np.asarray(triv(tiny))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(triv(tiny))
        ts.append(time.perf_counter() - t0)
    rpc = sorted(ts)[len(ts) // 2]
    log(f"RPC floor (trivial jit round-trip): {rpc * 1e3:.1f} ms")

    def run(pb):
        return dtw_batch_pallas(
            a, b, la, lb, band=BAND, normalize="path_len", pair_block=pb
        )

    for pb in (64, 128, 256, 512):
        try:
            t0 = time.perf_counter()
            np.asarray(run(pb))
            compile_s = time.perf_counter() - t0
            # per-call sync
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(pb))
                ts.append(time.perf_counter() - t0)
            sync_s = sorted(ts)[1]
            # pipelined: enqueue DEPTH, then materialize all
            outs = [run(pb) for _ in range(DEPTH)]
            for o in outs:
                np.asarray(o)  # drain
            t0 = time.perf_counter()
            outs = [run(pb) for _ in range(DEPTH)]
            for o in outs:
                np.asarray(o)
            pipe_s = (time.perf_counter() - t0) / DEPTH
            log(
                f"PB={pb:4d}: compile {compile_s:6.1f}s | sync {sync_s * 1e3:7.1f} ms "
                f"({BATCH / sync_s:10,.0f} pairs/s) | pipelined {pipe_s * 1e3:7.1f} ms "
                f"({BATCH / pipe_s:10,.0f} pairs/s)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"PB={pb}: FAILED {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
