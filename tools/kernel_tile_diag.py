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
--stripe drives the long-sequence TILE-STRIPE kernel instead
(ops/dtw_pallas.dtw_tile_stripe_pairs; wv_max = max(BAND, ddmax)) and also
times the per-pair stripe path on the same pairs for the amortization
ratio.  One TPU process at a time (CLAUDE.md).
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
    ap.add_argument("--stripe", action="store_true",
                    help="drive the long-sequence tile-stripe kernel "
                         "(banded, S > 256) and the per-pair stripe "
                         "baseline on the same pairs")
    ap.add_argument("--lane", action="store_true",
                    help="drive the LANE-PACKED tile kernel (pairs on "
                         "lanes, stripe on sublanes; ti must be a "
                         "128-multiple on hardware)")
    ap.add_argument("--diag", action="store_true",
                    help="drive the DIAG-corridor lane kernel "
                         "(dtw_tile_lane_diag_pairs, the production "
                         "headline path); --sweep specs are stack values")
    ap.add_argument("--stack", type=int, default=1,
                    help="with --diag: interleaved A-row chains per "
                         "program (config knob dtw.lane_stack)")
    ap.add_argument("--bgroup", type=int, default=1,
                    help="with --diag: B tiles lane-concatenated per "
                         "program (supertiles; ops get bgroup x wider on "
                         "lanes, same op count — the issue-bound lever)")
    ap.add_argument("--full", action="store_true",
                    help="drive the FULL-WIDTH (unbanded) lane kernel "
                         "(band=None fast path, round 4) and the per-pair "
                         "square baseline on the same pairs")
    ap.add_argument("--no-baseline", action="store_true",
                    help="with --stripe: skip the per-pair baseline timing")
    ap.add_argument("--panel-rows", type=int, default=32,
                    help="with --stripe: Gram panel rows (the skew's roll "
                         "traffic scales with log2(RB)*(RB+W))")
    ap.add_argument("--unroll-rows", type=int, default=4,
                    help="with --stripe: DP rows per fori_loop iteration")
    ap.add_argument("--sweep", default=None,
                    help="with --stripe: 'su,sv,rb[,ti[,ur]];...' configs "
                         "timed in THIS process (one tunnel handshake for "
                         "the whole sweep); parity-checks the first config "
                         "only")
    ap.add_argument("--repeats", default=None,
                    help="with --stripe: 'build,dp;...' repeat-slope probes "
                         "at the main geometry (cost of a stage = its "
                         "N-slope), e.g. '1,1;3,1;1,3'")
    args = ap.parse_args()

    import os

    if os.environ.get("APD_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw import dtw_batch
    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        diag_class_bounds,
        dtw_batch_pallas,
        dtw_tile_lane_diag_pairs,
        dtw_tile_lane_full_pairs,
        dtw_tile_lane_pairs,
        dtw_tile_pairs,
        dtw_tile_stripe_pairs,
        tile_rep_lengths,
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
    if args.diag:
        # Production-faithful: the scheduler length-sorts the corpus so
        # tiles are length-coherent (class bounds stay tight).
        lengths = jnp.sort(lengths)
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
    if args.diag:
        # LONG side on DP rows, exactly the scheduler's orientation
        # (tiles sorted ascending, so tile j >= i is the longer one).
        pairs = [(j, i) for (i, j) in pairs]
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    wv_max = max(BAND, args.ddmax)

    if args.diag:
        lens_np = np.asarray(lengths)
        tmin = [int(lens_np[t * args.ti:(t + 1) * args.ti].min())
                for t in range(nT)]
        tmax = [int(lens_np[t * args.ti:(t + 1) * args.ti].max())
                for t in range(nT)]
        rows_d = max(tmax[a] for a, _ in pairs)

        def diag_setup(G):
            """(rep, ii, jj, wv, kmax, n_pairs) for bgroup=G: B tiles are
            grouped into supertiles of G, pairs deduped to (A, supertile);
            every grouped program computes G blocks (a superset of the
            ungrouped pair list — throughput counts computed pairs)."""
            p2 = sorted({(a, b // G) for a, b in pairs})
            rep2 = jnp.asarray(tile_rep_lengths(
                lens_np, nT // G, args.ti * G, K))
            wv_g, km_g = BAND, 1
            for a, T in p2:
                wv, km = diag_class_bounds(
                    BAND, tmin[a], tmax[a],
                    min(tmin[T * G:(T + 1) * G]),
                    max(tmax[T * G:(T + 1) * G]))
                wv_g, km_g = max(wv_g, wv), max(km_g, km)
            i2 = jnp.asarray(np.array([p[0] for p in p2], np.int32))
            j2 = jnp.asarray(np.array([p[1] for p in p2], np.int32))
            return rep2, i2, j2, wv_g, km_g, len(p2) * G

        setups = {1: diag_setup(1)}
        rep, ii, jj, wv_d, kmax_d, _ = setups[1]
        log(f"diag class bounds (single merged class over "
            f"{len(pairs)} pairs): wv={wv_d} kmax={kmax_d} rows={rows_d} "
            f"stack={args.stack} bgroup={args.bgroup}")

        def run(stack=args.stack, bgroup=args.bgroup, wv=None, hoist=False):
            if bgroup not in setups:
                setups[bgroup] = diag_setup(bgroup)
            rep_g, ii_g, jj_g, wv_g, km_g, _ = setups[bgroup]
            return dtw_tile_lane_diag_pairs(
                feats, lengths, rep_g, ii_g, jj_g, ti=args.ti, band=BAND,
                wv_max=wv_g if wv is None else max(wv, wv_g), kmax=km_g,
                rows=args.rows if args.rows is not None else rows_d,
                unroll_rows=args.unroll_rows, stack=stack, bgroup=bgroup,
                hoist_build=hoist, interpret=not on_tpu)
    elif args.full:
        lmax = int(jnp.max(lengths))
        w_full = 8 * -(-lmax // 8)

        def run():
            return dtw_tile_lane_full_pairs(
                feats, lengths, ii, jj, ti=args.ti, width=w_full,
                rows=args.rows if args.rows is not None else lmax,
                unroll_rows=args.unroll_rows,
                interpret=not on_tpu)
    elif args.lane:
        def run():
            return dtw_tile_lane_pairs(
                feats, lengths, ii, jj, ti=args.ti, band=BAND,
                wv_max=wv_max, rows=args.rows,
                unroll_rows=args.unroll_rows,
                interpret=not on_tpu)
    elif args.stripe:
        def run():
            return dtw_tile_stripe_pairs(
                feats, lengths, ii, jj, ti=args.ti, su=args.su, sv=args.sv,
                band=BAND, wv_max=wv_max, rows=args.rows,
                panel_rows=args.panel_rows, unroll_rows=args.unroll_rows,
                interpret=not on_tpu)
    else:
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
    # (with --diag --bgroup G the dispatched pair list is the deduped
    # (A-tile, supertile) set and block columns span G*ti lanes)
    if args.diag:
        G = args.bgroup
        dpairs = [
            (int(a), int(T))
            for a, T in zip(*(np.asarray(x) for x in setups[G][1:3]))
        ]
        ncol = args.ti * G
    else:
        G, dpairs, ncol = 1, pairs, args.ti
    rng = np.random.default_rng(1)
    nchk = min(args.check_pairs, len(dpairs) * args.ti * ncol)
    pu = rng.integers(0, len(dpairs), nchk)
    ru = rng.integers(0, args.ti, nchk)
    cu = rng.integers(0, ncol, nchk)
    gi = np.array([dpairs[p][0] * args.ti + r for p, r in zip(pu, ru)])
    gj = np.array([dpairs[p][1] * ncol + c for p, c in zip(pu, cu)])
    if args.diag:
        # Diag semantics ride the pure-JAX scan path as reference (same
        # Gram-trick numerics; its own oracle parity is pinned in
        # tests/test_dtw_diag.py).
        ref = np.asarray(dtw_batch(
            feats[gi], feats[gj], lengths[gi], lengths[gj],
            band=BAND, band_mode="diag"))
    else:
        ref = np.asarray(dtw_batch_pallas(
            feats[gi], feats[gj], lengths[gi], lengths[gj],
            band=None if args.full else BAND, max_len_diff=args.ddmax,
            interpret=not on_tpu))
    got = blocks[pu, ru, cu]
    # Self-pairs (possible under --diag --bgroup, where a supertile can
    # contain the A tile itself) are pure Gram-trick noise around a true 0
    # (per-cell cost = sqrt(clamped eps)); exclude them like the scheduler
    # does (it zeroes the diagonal exactly).
    ns = gi != gj
    got, ref = got[ns], ref[ns]
    ok = np.allclose(got, ref, rtol=1e-4, atol=1e-4)
    log(f"tile parity vs per-pair kernel ({nchk} sampled pairs): "
        f"{'OK' if ok else 'MISMATCH'} "
        f"(max abs diff {np.max(np.abs(got - ref)):.2e})")
    if args.check_only:
        return 0 if ok else 1

    n_pairs = (len(dpairs) * args.ti * ncol if args.diag
               else len(pairs) * args.ti * args.ti)
    for o in [run() for _ in range(2)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(ITERS)]
        for o in outs:
            np.asarray(o)
        best = max(best, n_pairs * ITERS / (time.perf_counter() - t0))
    kind = ("lane-diag" if args.diag else "lane-full" if args.full
            else "lane" if args.lane
            else ("tile-stripe" if args.stripe else "tile"))
    log(f"RESULT {kind}: {best:,.0f} pairs/s over {n_pairs} pairs/dispatch")

    if (args.stripe or args.full) and not args.no_baseline:
        # Per-pair baseline on ONE tile-pair's worth of gathered pairs
        # (the full 64-program pair set would gather gigabytes).  --full
        # times the per-pair SQUARE kernel (band=None), the pre-round-4
        # route for unbanded S > 256 (VERDICT r3 item 3's 5x bar).
        bi = np.repeat(np.arange(args.ti), args.ti) + pairs[0][0] * args.ti
        bj = np.tile(np.arange(args.ti), args.ti) + pairs[0][1] * args.ti
        nb = len(bi)

        def run_pp():
            return dtw_batch_pallas(
                feats[bi], feats[bj], lengths[bi], lengths[bj],
                band=None if args.full else BAND,
                max_len_diff=args.ddmax, interpret=not on_tpu)

        np.asarray(run_pp())
        best_pp = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run_pp() for _ in range(2)]
            for o in outs:
                np.asarray(o)
            best_pp = max(best_pp, nb * 2 / (time.perf_counter() - t0))
        base_kind = "square" if args.full else "stripe"
        log(f"RESULT per-pair {base_kind} baseline: {best_pp:,.0f} pairs/s "
            f"({nb} gathered pairs/dispatch); {kind}/per-pair = "
            f"{best / max(best_pp, 1e-9):.2f}x")

    def time_cfg(fn, n, reps=2, iters=3):
        np.asarray(fn())                      # warm/compile
        b = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(iters)]
            for o in outs:
                np.asarray(o)
            b = max(b, n * iters / (time.perf_counter() - t0))
        return b

    if args.diag and args.sweep:
        # diag sweep specs: STACK values (the chain-interleave knob),
        # 'gN' for bgroup=N lane widening, or 'wN' forcing wv_max=N (the
        # class-width A/B: e.g. '1;w20' times the exact-width class
        # against the round-4 +2-slack width in ONE process) — one
        # process, one handshake.  Rates count COMPUTED pairs (a grouped
        # program computes all G blocks of its supertile).
        for spec in args.sweep.split(";"):
            if spec.startswith("w"):
                wvv = int(spec[1:])
                n_g = n_pairs
                lbl, fn = f"wv={wvv}", (lambda wvv=wvv: run(wv=wvv))
            elif spec.startswith("h"):
                hv = bool(int(spec[1:]))
                n_g = n_pairs
                lbl, fn = f"hoist={int(hv)}", (lambda hv=hv: run(hoist=hv))
            elif spec.startswith("g"):
                gv = int(spec[1:])
                if gv not in setups:
                    setups[gv] = diag_setup(gv)
                n_g = setups[gv][5] * args.ti * args.ti
                lbl, fn = f"bgroup={gv}", (lambda gv=gv: run(bgroup=gv))
            else:
                st = int(spec)
                n_g = n_pairs
                lbl, fn = f"stack={st}", (lambda st=st: run(stack=st))
            try:
                r = time_cfg(fn, n_g)
                log(f"SWEEP {kind} {lbl}: {r:,.0f} pairs/s")
            except Exception as e:  # noqa: BLE001
                log(f"SWEEP {kind} {lbl}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")

    if (args.lane or args.full) and args.sweep:
        # lane sweep specs: 'ur' per config (geometry is fixed by ti)
        for spec in args.sweep.split(";"):
            ur_s = int(spec)

            def run_l(ur_s=ur_s):
                if args.full:
                    return dtw_tile_lane_full_pairs(
                        feats, lengths, ii, jj, ti=args.ti, width=w_full,
                        rows=args.rows if args.rows is not None else lmax,
                        unroll_rows=ur_s, interpret=not on_tpu)
                return dtw_tile_lane_pairs(
                    feats, lengths, ii, jj, ti=args.ti, band=BAND,
                    wv_max=wv_max, rows=args.rows, unroll_rows=ur_s,
                    interpret=not on_tpu)

            try:
                r = time_cfg(run_l, n_pairs)
                log(f"SWEEP {kind} UR={ur_s}: {r:,.0f} pairs/s")
            except Exception as e:  # noqa: BLE001
                log(f"SWEEP {kind} UR={ur_s}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")

    if args.stripe and args.sweep:
        for spec in args.sweep.split(";"):
            parts = [int(x) for x in spec.split(",")]
            su_s, sv_s, rb_s = parts[:3]
            ti_s = parts[3] if len(parts) > 3 else args.ti
            ur_s = parts[4] if len(parts) > 4 else args.unroll_rows
            nT_s = K // ti_s
            ap_s = [(i, j) for i in range(nT_s) for j in range(i + 1, nT_s)]
            st_s = max(1, len(ap_s) // 64)
            ps = ap_s[::st_s][:64]
            ii_s = jnp.asarray(np.array([p[0] for p in ps], np.int32))
            jj_s = jnp.asarray(np.array([p[1] for p in ps], np.int32))

            def run_s(su_s=su_s, sv_s=sv_s, rb_s=rb_s, ti_s=ti_s,
                      ur_s=ur_s, ii_s=ii_s, jj_s=jj_s):
                return dtw_tile_stripe_pairs(
                    feats, lengths, ii_s, jj_s, ti=ti_s, su=su_s, sv=sv_s,
                    band=BAND, wv_max=wv_max, rows=args.rows,
                    panel_rows=rb_s, unroll_rows=ur_s,
                    interpret=not on_tpu)

            try:
                r = time_cfg(run_s, len(ps) * ti_s * ti_s)
                log(f"SWEEP ti={ti_s} su={su_s} sv={sv_s} RB={rb_s} "
                    f"UR={ur_s}: {r:,.0f} pairs/s")
            except Exception as e:  # noqa: BLE001 — sweep survives a cfg
                log(f"SWEEP ti={ti_s} su={su_s} sv={sv_s} RB={rb_s} "
                    f"UR={ur_s}: FAILED {type(e).__name__}: {str(e)[:200]}")

    if args.stripe and args.repeats:
        for spec in args.repeats.split(";"):
            br, dr = (int(x) for x in spec.split(","))

            def run_r(br=br, dr=dr):
                return dtw_tile_stripe_pairs(
                    feats, lengths, ii, jj, ti=args.ti, su=args.su,
                    sv=args.sv, band=BAND, wv_max=wv_max, rows=args.rows,
                    panel_rows=args.panel_rows, build_repeats=br,
                    dp_repeats=dr, interpret=not on_tpu)

            r = time_cfg(run_r, n_pairs)
            log(f"REPEATS build={br} dp={dr}: {r:,.0f} pairs/s "
                f"({n_pairs / r * 1e3:.1f} ms/dispatch)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
