#!/usr/bin/env python
"""All-pairs TILE kernel probe (round 3): amortize sequence DMA over pairs.

THE round-3 finding (see BASELINE.md round-3 section): this device's
observable HBM bandwidth is ~17.6 GB/s (plain XLA elementwise; 46x below
v5e spec — tunnel/virtualization reality), and pallas input streaming runs
at ~7-9 GB/s.  The per-pair square kernel ships 16 KB of gathered features
per pair, so its ~1.0M pairs/s ceiling is the LINK, not the VPU (round-2's
"per-row VPU floor" was a misdiagnosis of mechanism: the row loop was
timing hidden input DMA — kernel_pack_diag's dma/dmafeat/dp-repeats probes
demonstrate all of this).

Fix: all-pairs DTW has massive data reuse — each sequence participates in
~K pairs.  This TILE kernel loads TI+TJ sequences once (~2.2 MB) and
computes all TI*TJ pairs (16384) in one program: ~135 B/pair, moving the
DMA roofline from ~1M to >100M pairs/s, so compute is the limit again.

Structure per tile-pair program (all static shapes):
  for each (su x sv)-pair subtile:                          [fori_loop]
    for u in range(su):                                     [fori_loop]
      cmat[:, u*sv:(u+1)*sv, :] = mask(metric(
          dot(a[u0+u], b[v0:v0+sv])))    MXU HIGHEST -> [R, sv, S]
    square-frame min-plus row-scan DP over [P, S] rows (the production
    square kernel's recurrence in the round-2 "J" scratch layout [R,P,S],
    which measured +5% over [P,R,S])
    out[u0:u0+su, v0:v0+sv] = extracted distances

Usage: python tools/kernel_tile_diag.py [--ti 128] [--su 8] [--sv 32]
           [--ddmax 16] [--ntiles 8] [--check-only]
One TPU process at a time (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEQ_LEN = 128
LATENT_DIM = 16
BAND = 16
ITERS = 6
INF = float("inf")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _tile_kernel(
    a_ref,      # [TI, da, S] f32 time-minor, channels (-2a | 1 | sqa)
    b_ref,      # [TJ, da, S] f32 time-minor, channels (b | sqb | 1)
    la_ref,     # [TI, 1] i32
    lb_ref,     # [TJ, 1] i32
    out_ref,    # [TI, 1, nv, sv] f32 (v-blocks on a sublane-major dim:
                #  dynamic-offset stores are only supported there, and the
                #  block's last two dims must equal the array's)
    cmat_ref,   # scratch [S, su, sv, S] f32 — subtile cost, row-major
    ex_ref,     # scratch [su, sv, S] i32 — extraction row per (pair, lane)
    *,
    su: int,
    sv: int,
    band: int,
    metric: str,
    scan_steps: int,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TI = a_ref.shape[0]
    TJ = b_ref.shape[0]
    S = a_ref.shape[2]
    R = S
    nv = TJ // sv
    n_sub = (TI // su) * nv

    # All per-pair tensors keep the natural [su, sv, S] shape: Mosaic
    # rejects reshapes that merge tiled (sublane x lane) dims, so the pair
    # dim is never flattened; scalars (la_u) and [sv, 1] ref reads broadcast
    # against iotas without any relayout.
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (su, sv, S), 2)

    def subtile(st, _):
        u0 = (st // nv) * su
        v0 = (st % nv) * sv
        b_sub = b_ref[pl.ds(v0, sv)]                     # [sv, da, S]
        lb_sub = lb_ref[pl.ds(v0, sv)]                   # [sv, 1]

        def build_u(u, _):
            av = a_ref[u0 + u]                           # [da, S]
            la_u = la_ref[u0 + u, 0]
            g = jax.lax.dot_general(
                av, b_sub,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST: bf16-cancellation guard, as in the square kernel
                precision=jax.lax.Precision.HIGHEST,
            )                       # [R, sv, S]: sqa + sqb - 2ab (channels)
            ii = jax.lax.broadcasted_iota(jnp.int32, (R, sv, S), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (R, sv, S), 2)
            wv = jnp.maximum(jnp.int32(band), jnp.abs(la_u - lb_sub))[None]
            valid = (
                (ii < la_u)
                & (jj < lb_sub[None])
                & (jnp.abs(jj - ii) <= wv)
            )
            if metric == "cosine":
                cost = 1.0 - g
            else:
                sq = jnp.maximum(g, 0.0)
                cost = jnp.sqrt(sq) if metric == "euclidean" else sq
            cmat_ref[:, pl.ds(u, 1)] = jnp.where(valid, cost, INF)[:, None]
            # extraction row per (v, lane): la_u-1 where lane == lb_v-1
            lanes2 = jax.lax.broadcasted_iota(jnp.int32, (sv, S), 1)
            ex_u = jnp.where(lanes2 == lb_sub - 1, la_u - 1, -1)
            ex_ref[pl.ds(u, 1)] = ex_u[None]
            return 0

        jax.lax.fori_loop(0, su, build_u, 0)

        # ---- square-frame min-plus row scan over [su, sv, S] rows --------
        # (the production square kernel's recurrence; masking is already in
        # cmat, so the loop body needs no validity ops)
        ex3 = ex_ref[:]

        def row_body(i, carry):
            prev, out = carry
            c = cmat_ref[i]                              # [su, sv, S]
            prev_shift = jnp.where(
                lanes3 >= 1, pltpu.roll(prev, 1, axis=2), INF
            )
            e = c + jnp.minimum(prev, prev_shift)
            e = jnp.where((i == 0) & (lanes3 == 0), c, e)
            ee, cc = e, c
            sh = 1
            for t in range(scan_steps):
                mask = lanes3 >= sh
                ee = jnp.where(
                    mask, jnp.minimum(ee, pltpu.roll(ee, sh, axis=2) + cc), ee
                )
                if t < scan_steps - 1:
                    cc = jnp.where(mask, cc + pltpu.roll(cc, sh, axis=2), cc)
                sh *= 2
            out = jnp.where(i == ex3, ee, out)
            return ee, out

        init = (
            jnp.full((su, sv, S), INF),
            jnp.full((su, sv, S), INF),
        )
        _, outp = jax.lax.fori_loop(0, R, row_body, init)
        vb = st % nv
        out_ref[pl.ds(u0, su), :, pl.ds(vb, 1)] = (
            jnp.min(outp, axis=2)[:, None, None]
        )
        return 0

    jax.lax.fori_loop(0, n_sub, subtile, 0)


@partial(
    __import__("jax").jit,
    static_argnames=("ti", "su", "sv", "band", "metric", "normalize",
                     "interpret"),
)
def dtw_tile_allpairs(
    feats,        # [K, S, d] f32 padded sequences (device-resident corpus)
    lengths,      # [K] i32
    *,
    ti: int = 128,
    su: int = 8,
    sv: int = 32,
    band: int = BAND,
    metric: str = "euclidean",
    normalize: str = "none",
    interpret: bool = False,
):
    """All-pairs DTW distances -> [K, K] (full square, self-pairs included).

    One pallas program per (ti x ti) tile-pair; sequences stream once per
    tile, pairs never leave VMEM.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, S, d = feats.shape
    assert K % ti == 0, (K, ti)
    nT = K // ti
    f32 = feats.astype(jnp.float32)
    sq = jnp.sum(f32 * f32, axis=2)                      # [K, S]
    ones = jnp.ones((K, 1, S))
    # Full squared distance rides ONE dot: (-2a | 1 | sqa).(b | sqb | 1)
    # = sqa + sqb - 2ab, accumulated together in f32 under HIGHEST (the
    # same cancellation guard as the square kernel, fused).
    a_aug = jnp.concatenate(
        [jnp.transpose(-2.0 * f32, (0, 2, 1)), ones, sq[:, None, :]], axis=1
    )                                                    # [K, d+2, S]
    b_aug = jnp.concatenate(
        [jnp.transpose(f32, (0, 2, 1)), sq[:, None, :], ones], axis=1
    )
    la2 = lengths.astype(jnp.int32)[:, None]
    P = su * sv
    da = d + 2
    scan_steps = max(1, (S - 1).bit_length())

    kernel = partial(
        _tile_kernel, su=su, sv=sv, band=band, metric=metric,
        scan_steps=scan_steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nT, nT),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((ti, da, S), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, da, S), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, 1, ti // sv, sv),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, nT, ti // sv, sv), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, su, sv, S), jnp.float32),
            pltpu.VMEM((su, sv, S), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nT * nT * ti * ti * S * S * da,
            bytes_accessed=nT * nT * 2 * ti * da * S * 4,
            transcendentals=nT * nT * ti * ti * S * S
            if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(a_aug, b_aug, la2, la2)
    out = out.reshape(K, K)
    if normalize == "path_len":
        ls = lengths.astype(jnp.float32)
        out = out / (ls[:, None] + ls[None, :])
    elif normalize != "none":
        raise ValueError(f"unknown normalize {normalize!r}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ti", type=int, default=128)
    ap.add_argument("--su", type=int, default=8)
    ap.add_argument("--sv", type=int, default=32)
    ap.add_argument("--ddmax", type=int, default=16)
    ap.add_argument("--ntiles", type=int, default=8)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--check-pairs", type=int, default=512)
    ap.add_argument("--seqlen", type=int, default=SEQ_LEN)
    args = ap.parse_args()

    import os

    if os.environ.get("APD_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_batch_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu", "gpu")
    K = args.ti * args.ntiles
    S = args.seqlen
    log(f"device: {dev}; K={K} S={S} ti={args.ti} su={args.su} sv={args.sv}")

    kk = jax.random.split(jax.random.PRNGKey(0), 2)
    feats = jax.random.normal(kk[0], (K, S, LATENT_DIM), jnp.float32)
    lengths = jax.random.randint(
        kk[1], (K,), S - args.ddmax, S + 1
    ).astype(jnp.int32)

    def run():
        return dtw_tile_allpairs(
            feats, lengths, ti=args.ti, su=args.su, sv=args.sv,
            band=BAND, interpret=not on_tpu)

    t0 = time.perf_counter()
    D = np.asarray(run())
    log(f"tile kernel: compile+warm {time.perf_counter() - t0:.1f}s")

    # correctness: random sample of pairs vs the oracle-verified square kernel
    rng = np.random.default_rng(1)
    nchk = min(args.check_pairs, K * K)
    iu = rng.integers(0, K, nchk).astype(np.int32)
    jv = rng.integers(0, K, nchk).astype(np.int32)
    ref = np.asarray(dtw_batch_pallas(
        feats[iu], feats[jv], lengths[iu], lengths[jv],
        band=BAND, max_len_diff=args.ddmax, interpret=not on_tpu))
    got = D[iu, jv]
    ok = np.allclose(got, ref, rtol=1e-4, atol=1e-4)
    log(f"tile parity vs square ({nchk} sampled pairs): "
        f"{'OK' if ok else 'MISMATCH'} "
        f"(max abs diff {np.max(np.abs(got - ref)):.2e})")
    if not ok:
        bad = np.argsort(-np.abs(got - ref))[:6]
        ln = np.asarray(lengths)
        for x in bad:
            log(f"  pair ({iu[x]},{jv[x]}): got {got[x]:.4f} "
                f"ref {ref[x]:.4f} la={ln[iu[x]]} lb={ln[jv[x]]}")
    if args.check_only:
        return 0 if ok else 1

    n_pairs = K * K
    for o in [run() for _ in range(2)]:
        np.asarray(o[0, 0])
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(ITERS)]
        for o in outs:
            np.asarray(o[0, 0])
        best = max(best, n_pairs * ITERS / (time.perf_counter() - t0))
    log(f"RESULT tile: {best:,.0f} pairs/s over {n_pairs} pairs "
        f"({args.ntiles}x{args.ntiles} tiles)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
