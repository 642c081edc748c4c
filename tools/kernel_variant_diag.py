#!/usr/bin/env python
"""One parameterized DTW-kernel variant harness (consolidates the round-2
kernel_diag{,3,4,5,6}.py one-offs — VERDICT r2 weak #6).

Times named variants of the square row-scan kernel in ONE TPU process with
bench.py's methodology (warmup wave drained, then best of 3 pipelined
windows).  The round-2 findings these variants produced are recorded in
BASELINE.md ("Round-2 kernel micro-architecture findings"); the headline
one: per-pair-row cost ~8 ns, invariant to op count, loop structure, read
mechanism, and ILP — the kernel sits at the VPU's practical per-row floor.

Variant axes (combine freely via --set, or use the named presets):
  scan_steps=N     Hillis-Steele depth (7 = full, 6 = banded class bound,
                   1/0 = DEGENERATE timing-only probes with wrong results)
  lean_extract     min-accumulate extraction instead of any/sum
  fused_build      fold validity masks into the cmat write (vs in-loop)
  unroll=1|2       rows per fori_loop iteration
  static_unroll    full python-loop row unroll (no fori_loop)
  scratch=bps|rps  [PB,R,S] dynamic-sublane read vs [R,PB,S] leading-dim
  streams=1|2|4    independent interleaved pair-streams per iteration (ILP)
  gram=0           skip the Gram build (DEGENERATE; isolates build cost)

Usage:
  python tools/kernel_variant_diag.py                 # control vs presets
  python tools/kernel_variant_diag.py A E F H K2      # pick presets
  python tools/kernel_variant_diag.py --set scan_steps=6 --set lean_extract=1
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

INF = float("inf")
SEQ_LEN = 128
LATENT_DIM = 16
BAND = 16
BATCH = 32_768
ITERS = 6
DEPTH = 4

PRESETS = {
    # control: the production square kernel's structure
    "A": dict(),
    # round-2 diag3: incremental candidate changes
    "B": dict(scan_steps=6),
    "C": dict(scan_steps=6, lean_extract=True),
    "D": dict(scan_steps=6, lean_extract=True, fused_build=True),
    # round-2 diag4: degenerate probes (WRONG results, timing only)
    "E": dict(scan_steps=1),
    "F": dict(scan_steps=0),
    "G": dict(unroll=2),
    "H": dict(gram=0),
    # round-2 diag5: loop/read mechanism
    "I": dict(static_unroll=True),
    "J": dict(scratch="rps"),
    # round-2 diag6: ILP probes
    "K2": dict(streams=2),
    "K4": dict(streams=4),
    "M2": dict(streams=2, pb=512),
}
_DEFAULTS = dict(
    scan_steps=7, lean_extract=False, fused_build=False, unroll=1,
    static_unroll=False, scratch="bps", streams=1, gram=1, pb=256,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(v):
    scan_steps = v["scan_steps"]
    streams = v["streams"]

    def kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, cmat_ref):
        R = a_ref.shape[2]
        S = b_ref.shape[2]
        PBk = a_ref.shape[0]
        q = PBk // streams
        a = a_ref[:]
        b = b_ref[:]
        if v["gram"]:
            gram = jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            sqa = jnp.sum(a * a, axis=1)
            sqb = jnp.sum(b * b, axis=1)
            sq = jnp.maximum(sqa[:, :, None] + sqb[:, None, :] - 2.0 * gram, 0.0)
            cost = jnp.sqrt(sq)
        else:
            cost = jnp.broadcast_to(b[:, :1, :1], (PBk, R, S))
        la_all = la_ref[:]
        lb_all = lb_ref[:]
        if v["fused_build"]:
            wv_all = jnp.maximum(jnp.int32(BAND), jnp.abs(la_all - lb_all))
            rows3 = jax.lax.broadcasted_iota(jnp.int32, (1, R, S), 1)
            lanes3 = jax.lax.broadcasted_iota(jnp.int32, (1, R, S), 2)
            valid = (
                (lanes3 < lb_all[:, :, None])
                & (rows3 < la_all[:, :, None])
                & (jnp.abs(lanes3 - rows3) <= wv_all[:, :, None])
            )
            cost = jnp.where(valid, cost, INF)
        if v["scratch"] == "rps":
            cmat_ref[:] = jnp.transpose(cost, (1, 0, 2))
        else:
            cmat_ref[:] = cost

        las = [la_all[s * q : (s + 1) * q] for s in range(streams)]
        lbs = [lb_all[s * q : (s + 1) * q] for s in range(streams)]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (q, S), dimension=1)
        col_valids = [lanes < lbs[s] for s in range(streams)]
        lane_eq_ts = [lanes == (lbs[s] - 1) for s in range(streams)]
        wvs = [
            jnp.maximum(jnp.int32(BAND), jnp.abs(las[s] - lbs[s]))
            for s in range(streams)
        ]

        def read_c(s, i):
            if v["scratch"] == "rps":
                return cmat_ref[i, s * q : (s + 1) * q, :]
            return cmat_ref[s * q : (s + 1) * q, i, :]

        def one_row(s, i, c, prev, out):
            if not v["fused_build"]:
                row_valid = (
                    col_valids[s] & (i < las[s]) & (jnp.abs(lanes - i) <= wvs[s])
                )
                c = jnp.where(row_valid, c, INF)
            prev_shift = jnp.where(lanes >= 1, pltpu.roll(prev, 1, axis=1), INF)
            e = c + jnp.minimum(prev, prev_shift)
            e = jnp.where((i == 0) & (lanes == 0), c, e)
            if scan_steps > 0:
                ee, cc = e, c
                sh = 1
                for _ in range(scan_steps):
                    mask = lanes >= sh
                    ee = jnp.where(
                        mask, jnp.minimum(ee, pltpu.roll(ee, sh, axis=1) + cc), ee
                    )
                    cc = jnp.where(mask, cc + pltpu.roll(cc, sh, axis=1), cc)
                    sh *= 2
                row = ee
            else:
                row = e
            hit = (i == (las[s] - 1)) & lane_eq_ts[s]
            if v["lean_extract"]:
                out = jnp.minimum(
                    out, jnp.min(jnp.where(hit, row, INF), axis=1, keepdims=True)
                )
            else:
                out = jnp.where(
                    jnp.any(hit, axis=1, keepdims=True),
                    jnp.sum(jnp.where(hit, row, 0.0), axis=1, keepdims=True),
                    out,
                )
            return row, out

        def all_streams(i, prevs, outs):
            new_p, new_o = [], []
            for s in range(streams):
                p, o = one_row(s, i, read_c(s, i), prevs[s], outs[s])
                new_p.append(p)
                new_o.append(o)
            return tuple(new_p), tuple(new_o)

        init = (
            tuple(jnp.full((q, S), INF) for _ in range(streams)),
            tuple(jnp.full((q, 1), INF) for _ in range(streams)),
        )
        if v["static_unroll"]:
            prevs, outs = init
            for i in range(R):
                prevs, outs = all_streams(i, prevs, outs)
        else:
            u = v["unroll"]

            def row_body(k, carry):
                prevs, outs = carry
                for du in range(u):
                    prevs, outs = all_streams(u * k + du, prevs, outs)
                return prevs, outs

            _, outs = jax.lax.fori_loop(0, R // u, row_body, init)
        out_ref[:] = jnp.concatenate(list(outs), axis=0)

    return kernel


@partial(jax.jit, static_argnames=("vkey",))
def run_variant(a, b, la, lb, *, vkey):
    v = dict(_DEFAULTS)
    v.update(dict(vkey))
    PB = v["pb"]
    B, R, d = a.shape
    S = b.shape[1]
    at = jnp.transpose(a, (0, 2, 1))
    bt = jnp.transpose(b, (0, 2, 1))
    la2 = la[:, None].astype(jnp.int32)
    lb2 = lb[:, None].astype(jnp.int32)
    scratch_shape = (
        (R, PB, S) if v["scratch"] == "rps" else (PB, R, S)
    )
    return pl.pallas_call(
        make_kernel(v),
        grid=(B // PB,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((PB, d, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32)],
    )(at, bt, la2, lb2)


def main() -> int:
    args = sys.argv[1:]
    sets: dict = {}
    names: list[str] = []
    it = iter(args)
    for tok in it:
        if tok == "--set":
            k, _, val = next(it).partition("=")
            sets[k] = (
                val if k == "scratch" else int(val)
            )
        else:
            names.append(tok)
    if sets:
        variants = [("custom", sets)]
    else:
        names = names or list(PRESETS)
        variants = [(n, PRESETS[n]) for n in names]

    rng = np.random.default_rng(0)
    lengths = rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32)
    a = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    la = jnp.asarray(lengths)
    lb = jnp.asarray(np.roll(lengths, 1))

    ref = None
    for name, kw in variants:
        vkey = tuple(sorted(kw.items()))
        fn = lambda vkey=vkey: run_variant(a, b, la, lb, vkey=vkey)
        t0 = time.perf_counter()
        got = np.asarray(fn())[:, 0]
        log(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
        merged = {**_DEFAULTS, **kw}
        degenerate = merged["scan_steps"] < 6 or not merged["gram"]
        if ref is None:
            ref = got
        elif not degenerate:
            log(f"{name}: max|delta vs first| = {np.nanmax(np.abs(got - ref)):.2e}")
        else:
            log(f"{name}: DEGENERATE variant (timing only, wrong results)")
        for o in [fn() for _ in range(DEPTH)]:
            np.asarray(o)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(ITERS)]
            for o in outs:
                np.asarray(o)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        log(f"{name}: {best:,.0f} pairs/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
