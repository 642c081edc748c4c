#!/usr/bin/env python
"""All-pairs TILE kernel harness: parity + throughput of the PRODUCTION
kernel (ops/dtw_pallas.dtw_tile_pairs) at chosen geometry/shape.

History: the round-3 prototype kernel lived here before productionizing;
this tool now drives the production kernel directly so there is no
duplicate kernel body to drift.  The findings it produced are recorded in
BASELINE.md ("Round-3 finding: the kernel 'VPU floor' was the MEMORY
SYSTEM"): geometry sweep (su,sv) in {8,16}x{32,64} all ~1.49-1.54M
pairs/s at S=128 before rows/scan classes, ~1.95-2.0M with them;
L=256 and the 128-multiple lane requirement were hardware-verified here.

Usage: python tools/kernel_tile_diag.py [--ti 128] [--su 8] [--sv 64]
           [--seqlen 128] [--ddmax 16] [--ntiles 8] [--rows N]
           [--scan-steps N] [--check-only]
One TPU process at a time (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LATENT_DIM = 16
BAND = 16
ITERS = 6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ti", type=int, default=128)
    ap.add_argument("--su", type=int, default=8)
    ap.add_argument("--sv", type=int, default=64)
    ap.add_argument("--seqlen", type=int, default=128)
    ap.add_argument("--ddmax", type=int, default=16)
    ap.add_argument("--ntiles", type=int, default=8)
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--scan-steps", type=int, default=None)
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--cmat-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--build-repeats", type=int, default=1,
                    help="re-run the cost build N times (timing slope "
                         "isolates the build's share)")
    ap.add_argument("--dp-repeats", type=int, default=1,
                    help="re-run the DP row loop N times (timing slope "
                         "isolates the DP's share)")
    ap.add_argument("--hoist-masks", action="store_true",
                    help="precompute the row scan's loop-invariant step "
                         "masks once per subtile instead of per DP row")
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--check-pairs", type=int, default=512)
    args = ap.parse_args()

    import os

    if os.environ.get("APD_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_batch_pallas,
        dtw_tile_pairs,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu", "gpu")
    K = args.ti * args.ntiles
    S = args.seqlen
    log(f"device: {dev}; K={K} S={S} ti={args.ti} su={args.su} sv={args.sv} "
        f"rows={args.rows} scan={args.scan_steps}")

    kk = jax.random.split(jax.random.PRNGKey(0), 2)
    feats = jax.random.normal(kk[0], (K, S, LATENT_DIM), jnp.float32)
    lengths = jax.random.randint(
        kk[1], (K,), S - args.ddmax, S + 1
    ).astype(jnp.int32)
    if args.rows is not None and args.rows < int(jnp.max(lengths)):
        log(f"ERROR: --rows {args.rows} < max length "
            f"{int(jnp.max(lengths))} violates the kernel's rows contract "
            "(pairs whose A length exceeds rows are never extracted)")
        return 2

    nT = args.ntiles
    # off-diagonal tile-pairs, strided across the triangle
    all_pairs = [(i, j) for i in range(nT) for j in range(i + 1, nT)] or [
        (0, 0)
    ]
    stride = max(1, len(all_pairs) // 64)
    pairs = all_pairs[::stride][:64]
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    def run():
        return dtw_tile_pairs(
            feats, lengths, ii, jj, ti=args.ti, su=args.su, sv=args.sv,
            band=BAND, rows=args.rows, scan_steps=args.scan_steps,
            gram_precision=args.precision, cmat_dtype=args.cmat_dtype,
            build_repeats=args.build_repeats, dp_repeats=args.dp_repeats,
            hoist_masks=args.hoist_masks,
            interpret=not on_tpu)

    t0 = time.perf_counter()
    blocks = np.asarray(run())
    log(f"tile kernel: compile+warm {time.perf_counter() - t0:.1f}s")

    # correctness: sampled pairs vs the oracle-verified per-pair kernel
    rng = np.random.default_rng(1)
    nchk = min(args.check_pairs, len(pairs) * args.ti * args.ti)
    pu = rng.integers(0, len(pairs), nchk)
    ru = rng.integers(0, args.ti, nchk)
    cu = rng.integers(0, args.ti, nchk)
    gi = np.array([pairs[p][0] * args.ti + r for p, r in zip(pu, ru)])
    gj = np.array([pairs[p][1] * args.ti + c for p, c in zip(pu, cu)])
    ref = np.asarray(dtw_batch_pallas(
        feats[gi], feats[gj], lengths[gi], lengths[gj],
        band=BAND, max_len_diff=args.ddmax, interpret=not on_tpu))
    got = blocks[pu, ru, cu]
    ok = np.allclose(got, ref, rtol=1e-4, atol=1e-4)
    log(f"tile parity vs per-pair kernel ({nchk} sampled pairs): "
        f"{'OK' if ok else 'MISMATCH'} "
        f"(max abs diff {np.max(np.abs(got - ref)):.2e})")
    if args.check_only:
        return 0 if ok else 1

    n_pairs = len(pairs) * args.ti * args.ti
    for o in [run() for _ in range(2)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(ITERS)]
        for o in outs:
            np.asarray(o)
        best = max(best, n_pairs * ITERS / (time.perf_counter() - t0))
    log(f"RESULT tile: {best:,.0f} pairs/s over {n_pairs} pairs/dispatch")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
